package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.embed.{Embedder, HashingEmbedder}
import graft.search.DurableQueryPipeline
import graft.state.Engine
import org.scalatest.funsuite.AnyFunSuite

/** O26's durability gap closed: the journaled pipeline must survive a
  * driver kill BETWEEN stages and resume without re-executing the
  * completed ones — the Temporal event-history contract
  * (query_workflow.py:266-340) the synchronous QueryPipeline could
  * not give.
  */
class DurableQueryPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Embedder that counts embed() calls — the "paid network stage"
    * whose at-most-once-per-workflow guarantee the spec pins. */
  private final class CountingEmbedder extends Embedder {
    val calls = new AtomicInteger
    private val inner = HashingEmbedder(dim = 8)
    def dim: Int = 8
    def embed(text: String): Array[Float] = { calls.incrementAndGet(); inner.embed(text) }
  }

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_durable_").toString

  test("kill after the embed stage resumes: setup/validate/embed replayed, not re-run") {
    val dir = tmpDir()
    val engine = new Engine()
    val embedder = new CountingEmbedder

    // first incarnation: crash AFTER the embed stage commits (the
    // driver dies between embed and search)
    val dying = new DurableQueryPipeline(spark, engine, embedder, dir,
      onStageCommitted = s => if (s == "embed") throw new RuntimeException("driver killed"))
    val boom = intercept[RuntimeException] {
      dying.run("wf-1", "lib-x", queryText = Some("quick fox"))
    }
    assert(boom.getMessage == "driver killed")
    assert(embedder.calls.get() >= 1)
    val embedCallsBeforeResume = embedder.calls.get()
    val libsAfterCrash = engine.listLibraries().map(_.id)
    assert(libsAfterCrash.size == 1) // setup ran once and journaled

    // second incarnation over the SAME journal: completed stages
    // replay from history; only search + rerank execute
    val resumed = new DurableQueryPipeline(spark, engine, embedder, dir)
    val result = resumed.run("wf-1", "lib-x", queryText = Some("quick fox"))
    assert(embedder.calls.get() == embedCallsBeforeResume,
      "embed stage re-executed on resume — journal replay broken")
    assert(engine.listLibraries().map(_.id) == libsAfterCrash,
      "setup stage re-executed on resume")
    assert(result.hits.nonEmpty)
    assert(result.durableExecution)
    assert(result.embeddingGenerated) // the REPLAYED embed stage's flag

    // the resumed result equals an uninterrupted run of the same query
    // against an identical engine (fresh engine + workflow id)
    val fresh = new DurableQueryPipeline(spark, new Engine(), new CountingEmbedder, tmpDir())
    val straight = fresh.run("wf-straight", "lib-x", queryText = Some("quick fox"))
    assert(result.hits.map(h => (h.text, BigDecimal(h.score).setScale(6, BigDecimal.RoundingMode.HALF_UP))) ==
      straight.hits.map(h => (h.text, BigDecimal(h.score).setScale(6, BigDecimal.RoundingMode.HALF_UP))))
  }

  test("a completed workflow re-run is a pure replay: no stage executes again") {
    val dir = tmpDir()
    val engine = new Engine()
    val embedder = new CountingEmbedder
    val p = new DurableQueryPipeline(spark, engine, embedder, dir)
    val first = p.run("wf-2", "lib-y", queryText = Some("lazy dog"))
    val calls = embedder.calls.get()
    val version = engine.listLibraries().head.version
    val again = p.run("wf-2", "lib-y", queryText = Some("lazy dog"))
    assert(embedder.calls.get() == calls)
    assert(engine.listLibraries().head.version == version) // no new mutations
    assert(again.hits.map(_.chunk_id) == first.hits.map(_.chunk_id))
  }

  test("distinct workflow ids do not share history") {
    val dir = tmpDir()
    val engine = new Engine()
    val embedder = new CountingEmbedder
    val p = new DurableQueryPipeline(spark, engine, embedder, dir)
    p.run("wf-a", "lib-z", queryText = Some("quick fox"))
    val calls = embedder.calls.get()
    p.run("wf-b", "lib-z", queryText = Some("quick fox"))
    // wf-b embeds for itself: 1 query embed + 2 seed-chunk embeds
    // (setup replaces the unknown id "lib-z" with a fresh library in
    // BOTH runs — the reference's id-replacement semantics — so wf-b
    // seeds its own library rather than finding wf-a's)
    assert(embedder.calls.get() == calls + 3)
  }

  test("resume in a FRESH process (new Engine) re-seeds setup but still replays the paid embed stage") {
    val dir = tmpDir()
    val embedder = new CountingEmbedder
    // first incarnation: the real driver-crash case — the journal file
    // outlives the in-memory engine entirely
    val dying = new DurableQueryPipeline(spark, new Engine(), embedder, dir,
      onStageCommitted = s => if (s == "embed") throw new RuntimeException("driver killed"))
    intercept[RuntimeException] { dying.run("wf-4", "lib-v", queryText = Some("quick fox")) }
    val callsAfterCrash = embedder.calls.get()

    // second incarnation: NEW process = NEW engine. The journaled
    // libId points at state the new engine has never seen; a naive
    // replay would die in the search stage with library-not-found on
    // every resume (the journal never un-sticks). Setup must fall back
    // to re-executing, while embed — the paid stage — still replays.
    val engine2 = new Engine()
    val resumed = new DurableQueryPipeline(spark, engine2, embedder, dir)
    val r = resumed.run("wf-4", "lib-v", queryText = Some("quick fox"))
    assert(r.hits.nonEmpty)
    assert(engine2.listLibraries().size == 1) // setup re-seeded the fresh engine
    // setup re-ran (2 seed-chunk embeds) but the QUERY embed replayed
    // from the journal — no third query-embed call
    assert(embedder.calls.get() == callsAfterCrash + 2,
      s"expected only the 2 seed embeds on resume, got ${embedder.calls.get() - callsAfterCrash}")
    // and the re-journaled setup means a THIRD run is a pure replay
    val calls2 = embedder.calls.get()
    val again = new DurableQueryPipeline(spark, engine2, embedder, dir)
      .run("wf-4", "lib-v", queryText = Some("quick fox"))
    assert(again.hits.map(_.text) == r.hits.map(_.text))
    assert(embedder.calls.get() == calls2)
  }

  test("fresh-process resume ALSO drops a journaled search: replayed hits must not point at dead-engine entities") {
    val dir = tmpDir()
    val embedder = new CountingEmbedder
    val engine1 = new Engine()
    // complete the whole workflow (search stage journaled), then the
    // process dies — journal outlives engine1
    val p1 = new DurableQueryPipeline(spark, engine1, embedder, dir)
    val r1 = p1.run("wf-5", "lib-u", queryText = Some("quick fox"))
    assert(r1.hits.nonEmpty)
    val deadLib = engine1.listLibraries().head.id

    // new process, new engine: replaying the journaled search verbatim
    // would hand back hits whose library_id/chunk_id reference engine1
    // entities that do not exist here. Setup invalidation must drop
    // the search stage so it re-executes against the re-seeded library.
    val engine2 = new Engine()
    val r2 = new DurableQueryPipeline(spark, engine2, embedder, dir)
      .run("wf-5", "lib-u", queryText = Some("quick fox"))
    val liveLib = engine2.listLibraries().head.id
    assert(r2.hits.nonEmpty)
    assert(r2.hits.forall(_.library_id == liveLib),
      s"replayed hits reference the dead engine's library $deadLib")
    val liveChunks = engine2.state.chunks.map(_.id).toSet
    assert(r2.hits.forall(h => liveChunks.contains(h.chunk_id)),
      "replayed hits reference chunk ids the live engine does not hold")
  }

  test("crash DURING a stage commit leaves the previous journal intact (stage re-runs)") {
    val dir = tmpDir()
    val engine = new Engine()
    val embedder = new CountingEmbedder
    // kill on the very first commit: nothing journaled durably beyond
    // the atomic move that already landed — resume re-runs setup
    var killed = false
    val dying = new DurableQueryPipeline(spark, engine, embedder, dir,
      onStageCommitted = s => if (s == "setup" && !killed) { killed = true; throw new RuntimeException("kill") })
    intercept[RuntimeException] { dying.run("wf-3", "lib-w", queryText = Some("quick fox")) }
    // the setup COMMIT landed before the hook fired (hook models the
    // crash after the atomic move), so resume replays it
    val resumed = new DurableQueryPipeline(spark, engine, embedder, dir)
    val r = resumed.run("wf-3", "lib-w", queryText = Some("quick fox"))
    assert(r.hits.nonEmpty)
    assert(engine.listLibraries().size == 1)
  }
}
