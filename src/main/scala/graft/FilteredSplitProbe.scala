package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prices the scoring kinds' FILTERED policy (r17, open thread (a))
  * against the plain filtered exact scan — the comparison the thread
  * said to run BEFORE believing the design. Both arms answer the same
  * question (top-k by cosine among rows passing a metadata predicate)
  * over the same 1M-row split layout:
  *
  *  - EXACT arm: filter + brute top-k over the floats table. The label
  *    predicate pushes to parquet, but labels are uniformly scattered
  *    so no row group is ever skipped — the scan reads every row at
  *    FLOAT width (~264 B/row at 64-d: the embedding column dominates).
  *  - STAGED arm ([[graft.index.PqIndexStore.searchRefinedSplitFiltered]]):
  *    the predicate evaluates on a NARROW (id + label) projection
  *    (~12 B/row — column pruning leaves the embedding unread), the
  *    surviving ids semi-join into the codes ADC scan (~17 B/row), and
  *    floats are point-fetched for the shortlist only. Row COUNTS are
  *    similar (both pass the corpus once); the claim is a BYTES claim,
  *    so rows-read per stage × row width is the honest proxy (byte
  *    counters are unreliable on local files — the PqServeProbe
  *    convention).
  *
  * Two selectivities bound the policy's territory: a SELECTIVE filter
  * (5%) is the design case — the semi side broadcasts and the staged
  * arm wins on width; a BROAD filter (50%) is the hazard case the
  * policy's opt-in flag exists for — the semi side is corpus-sized, so
  * Spark shuffles the codes join and the exact scan starts to compete.
  * The staged arm is approximate past pool > candidates, so recall@10
  * vs the exact arm is printed alongside (the gate SFs stay exact by
  * pool <= shortlist; at 1M the shortlist is the recall knob exactly
  * as in every PQ serve).
  *
  * Usage: runMain graft.FilteredSplitProbe [rows]  (default 1,000,000)
  * Results recorded in README's filtered-policy note.
  */
object FilteredSplitProbe {

  private final class RowsRead extends SparkListener {
    @volatile var inputRecords = 0L
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) inputRecords += m.inputMetrics.recordsRead
    }
    def reset(): Unit = inputRecords = 0L
  }

  private def smix(x: Long): Long = graft.functions.TextFunctions.splitmix64(x)

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new RowsRead
    spark.sparkContext.addSparkListener(listener)

    val dim = 64
    val vecOf = udf { (id: Long) =>
      Array.tabulate(dim)(j => ((smix(id * dim + j) % 2000L) / 1000.0).toFloat)
    }
    val root = "target/filtered-split-probe/index"
    if (!new java.io.File(s"$root/floats/_SUCCESS").exists()) {
      val gen = spark.range(rows)
        .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"),
          (abs(hash(col("id"))) % 20).cast("int").as("label"))
      val t0 = System.nanoTime()
      graft.index.PqIndexStore().writeSplit(gen, col("vec_id"), col("embedding"),
        dim, root, floatFiles = 64, knownCount = rows,
        payload = Seq(col("label")))
      println(f"FILTSPLIT build (train+encode+floats, one-time): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } else println("FILTSPLIT build: skipped (exists)")

    val floats = spark.read.parquet(s"$root/floats")
    val q = floats.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

    def probe(label: String)(f: => Seq[(Long, Double)]): Seq[(Long, Double)] = {
      listener.reset()
      val t0 = System.nanoTime()
      val out = f
      val elapsed = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus is async; let TaskEnd drain
      println(f"FILTSPLIT $label: $elapsed%.2f s, rowsRead=${listener.inputRecords}")
      out
    }

    for ((tag, pred, pct) <- Seq(
        ("selective-5pct", col("label") === 3, 5),
        ("broad-50pct", col("label") < 10, 50))) {
      // NOTE: no untimed warm-up pass is performed — the first measured
      // arm (the exact scan of each selectivity) absorbs one-time costs
      // (file listing, codebook load, fresh-build page-cache effects),
      // so first-arm wall-clock reads high; the rows-read ledger is the
      // load-bearing comparison (r17 ADVICE, low).
      val exact = probe(s"$tag exact-filtered-scan") {
        graft.index.BruteForceKnn
          .search(floats.where(pred), col("embedding"), col("vec_id"), q, 10)
          .select(col("vec_id"), col("score"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      val staged = probe(s"$tag staged-semijoin-serve") {
        graft.index.PqIndexStore()
          .searchRefinedSplitFiltered(spark, root, "vec_id", "embedding",
            pred, q, k = 10, dim = dim, candidates = 100)
          .select(col("vec_id"), col("score"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      }
      val recall = exact.map(_._1).toSet.intersect(staged.map(_._1).toSet).size / 10.0
      println(f"FILTSPLIT $tag: filter keeps ~$pct%%, recall@10 vs exact = $recall%.2f")
      if (pct == 5) {
        // the recall knob: a 50k-row pool at candidates=100 misranks
        // near the boundary; widening the shortlist is the same dial
        // every PQ serve documents
        val wide = probe(s"$tag staged-semijoin-serve c=1000") {
          graft.index.PqIndexStore()
            .searchRefinedSplitFiltered(spark, root, "vec_id", "embedding",
              pred, q, k = 10, dim = dim, candidates = 1000)
            .select(col("vec_id"), col("score"))
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        }
        val wr = exact.map(_._1).toSet.intersect(wide.map(_._1).toSet).size / 10.0
        println(f"FILTSPLIT $tag: recall@10 at candidates=1000 = $wr%.2f")
      }
    }
    // width ledger for the bytes claim (rows-read × width is the proxy)
    println("FILTSPLIT widths: float row ~264 B (64-d), narrow id+label ~12 B, codes ~17 B")
    println("FILTSPLIT verdict: at 1M/local the exact filtered scan is memory-speed " +
      "and wins wall-clock (one job vs three); the staged arm's claim is the " +
      "BYTES ledger (~29 B/row effective vs 264 B/row) — the disk/network-bound " +
      "regime at 100 TB — plus the point fetch's row-group pigeonhole " +
      "(writeSplit(floatRowGroupBytes) is the store-owned fix, priced in " +
      "PqServeProbe). Broad filters are the exact scan's territory: no width " +
      "win survives a corpus-sized semi side, which is why the policy is " +
      "opt-in per registration.")
    spark.stop()
  }
}
