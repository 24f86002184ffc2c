package graft.search

import graft.index.{IndexGenerations, LshIndexStore, RandomHyperplaneLsh}
import graft.state.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bridges the reference's O12 search orchestrator onto the PRODUCTION
  * serving tier (r15 verdict, Next #5): until r16, `index = "lsh"`
  * REST searches answered from the engine-state bucket cache
  * (reference parity — in-process, rebuilt per (library, version)),
  * while the rule-served at-rest layouts, the registered policies and
  * the guaranteed-k ladder were reachable only through gates. This
  * bridge is the missing link: [[register]] writes a library's corpus
  * as an [[LshIndexStore]] layout at its CURRENT version and registers
  * it with the optimizer rule under the GUARANTEED-K policy, and
  * [[SearchService]] then serves `index = "lsh"` through it — envelope
  * unchanged (`index`, `index_used`, `library_version`), `index_used`
  * distinguishing the tier (`lsh_at_rest` for the plain probe,
  * `at_rest_<level>` when a metadata filter rode the escalation
  * ladder).
  *
  * Staleness is the reference's own contract: the registration is
  * version-pinned, and a search at any OTHER library version falls
  * back to the transient path (correct, just not layout-served) until
  * [[register]] is called again — which also swaps generations the
  * r16 way: register(new) → unregister(old) → retire(old) through
  * [[IndexGenerations]], serving reads holding a lease so a re-register
  * mid-flight defers the old directory's deletion instead of racing it.
  */
final class AtRestIndexBridge(baseDir: String = "target/at-rest-bridge",
                              numPhysicalPartitions: Int = 16) {

  private final case class Entry(path: String, version: Int,
                                 lsh: RandomHyperplaneLsh, dim: Int,
                                 layout: DataFrame)

  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]

  /** Build + register `libraryId`'s corpus at its current version.
    * Returns the layout path. Idempotent per (library, version); a
    * NEW version writes a new generation and retires the old one. */
  def register(spark: SparkSession, engine: Engine, libraryId: String,
               lsh: RandomHyperplaneLsh = RandomHyperplaneLsh(8, 12, 42L)): String = {
    val version = engine.getLibrary(libraryId).version
    val existing = Option(entries.get(libraryId))
    if (existing.exists(_.version == version)) return existing.get.path
    val corpus = engine.chunksDF(spark)
      .where(col("library_id") === libraryId && col("embedding").isNotNull)
    val first = corpus.select(col("embedding")).limit(1).collect()
    require(first.nonEmpty, s"library $libraryId has no embedded chunks to index")
    val dim = first(0).getSeq[Float](0).length
    val path = s"$baseDir/$libraryId/v$version"
    LshIndexStore(lsh, dim, numPhysicalPartitions).write(corpus, "embedding", path)
    graft.plans.LshProbeRewrite.register(path, lsh, dim, numPhysicalPartitions,
      guaranteeK = true)
    injectRule(spark)
    // layout DataFrame cached per entry: a serving layer lists the
    // partition directories once and reuses the FileIndex (the
    // lshRuleIndexCache lesson — re-listing per query costs more than
    // the probe); partition pruning still applies per query
    entries.put(libraryId, Entry(path, version, lsh, dim,
      spark.read.parquet(path)))
    existing.filter(_.path != path).foreach { old =>
      graft.plans.LshProbeRewrite.unregister(old.path)
      IndexGenerations.retire(old.path): Unit // deferred while serves hold leases
    }
    path
  }

  private def injectRule(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.LshProbeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.LshProbeRewrite
    if (!spark.experimental.extraStrategies.exists(_.isInstanceOf[graft.plans.LshProbeStrategy]))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.LshProbeStrategy(spark)
  }

  /** Serve one O12 query from the registered layout if `libraryId` is
    * registered AT `version` (else None — the caller falls back to the
    * transient path). `pack` runs under the generation's read lease,
    * so a concurrent re-register cannot delete the directory
    * mid-collect; it receives the served frame (plain columns + a
    * `score`, plus `index_used` when `laddered`) and whether the
    * guaranteed-k ladder was in play (a metadata filter was present).
    * The `require` keeps a silent non-rewrite loud: the registered
    * tier exists to serve the probe, and an exact scan here would be
    * correct rows through the wrong component. */
  private[search] def tryServe[A](spark: SparkSession, libraryId: String,
                                  version: Int, qvec: Array[Float], k: Int,
                                  filters: Map[String, String])
                                 (pack: (DataFrame, Boolean) => A): Option[A] =
    Option(entries.get(libraryId)).filter(_.version == version).map { e =>
      IndexGenerations.lease(e.path) {
        // serve the PAYLOAD, not the layout internals: hits never
        // expose bucket machinery, and the ladder rewrite only binds
        // plans whose projection is layout-oblivious (a deduped
        // candidate has no single honest `bucket` value) — the probe
        // rewrite still finds table/bucket/bucket_part on the scan
        // BELOW this projection
        val filtered = filters.foldLeft(
          e.layout.drop("table", "bucket", "bucket_part")) { case (df, (key, value)) =>
          df.where(col("metadata").getItem(key) === lit(value))
        }
        val laddered = filters.nonEmpty
        val scored = filtered.withColumn("score",
          graft.expressions.CosineSimilarity(col("embedding"), typedlit(qvec.toSeq)))
        val out = (if (laddered) scored.withColumn("index_used", lit("auto"))
                   else scored)
          .orderBy(col("score").desc, col("id").asc)
          .limit(k)
        val plan = out.queryExecution.optimizedPlan.toString
        require(
          if (laddered) plan.contains("gk_level")
          else plan.contains("LshProbeTopK"),
          s"registered-tier serve for $libraryId did not go through the rule " +
            s"(probe/ladder missing from the optimized plan):\n${plan.take(1800)}")
        pack(out, laddered)
      }
    }
}
