package graft

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exact similarity join at 1M documents: proves the prefix-filtered
  * Jaccard self-join's scale shape at three orders of magnitude past
  * the gate corpus (sf0.1 = 5k docs). The corpus is `dupRate`-sized
  * duplicate groups over rows/dupRate distinct 30-word texts — the
  * last member of each group has its first word mutated, so the probe
  * exercises BOTH exact copies (J = 1.0) and genuine near-dups
  * (J = 27/29 ≈ 0.93, one of 28 shingles changed). Words are
  * splitmix64-derived printable strings (high-entropy by construction;
  * see PhashScaleProbe's aliasing postmortem), so cross-group shingle
  * collisions are negligible and the measurement isolates the filter.
  *
  * Claims measured rather than asserted:
  *   - candidate pairs ≈ N·(dupRate−1) — per-group, NOT the N²/2 of a
  *     naive all-pairs (the blocking ratio line);
  *   - expected true pairs per group = C(d−1,2) identical + (d−1)
  *     near: rows/d · (C(d−1,2) + d−1) in total, and every one is
  *     found (losslessness at scale, not just at the spec corpus);
  *   - shuffle bytes per phase: the wide stages carry 8-byte hashed
  *     keys, and candidate generation ships bare id pairs.
  * Usage: runMain graft.SimJoinScaleProbe [rows] [dupRate]
  */
object SimJoinScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 1000000L
    val dupRate = if (args.length > 1) args(1).toInt else 4
    require(dupRate >= 2, "dupRate must be >= 2 for duplicate groups to exist")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val distinctDocs = rows / dupRate
    // 30 six-char words per doc; group g's members share words
    // derived from g, except the last member's word 0 is drawn from a
    // disjoint stream (the near-dup mutant)
    val textUdf = udf { (group: Long, mutate: Boolean) =>
      val sb = new java.lang.StringBuilder(30 * 7)
      var w = 0
      while (w < 30) {
        val seed = if (w == 0 && mutate) 0x5DEECE66DL + group else group * 64L + w
        var c = 0
        while (c < 6) {
          var x = seed * 6364136223846793005L + c * 0x9E3779B97F4A7C15L
          x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
          x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
          x ^= (x >>> 31)
          sb.append(('a' + java.lang.Math.floorMod(x, 26L).toInt).toChar)
          c += 1
        }
        if (w < 29) sb.append(' ')
        w += 1
      }
      sb.toString
    }
    // cache path KEYED on the arguments (PhashScaleProbe's rule: a
    // stale corpus must never feed this run's expected-pair math)
    val corpusPath = s"target/simjoin-probe/corpus-$rows-$dupRate"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      spark.range(rows)
        .select(col("id").as("doc_id"),
          textUdf(col("id") % distinctDocs,
            col("id") >= lit(distinctDocs * (dupRate - 1))).as("text"))
        .write.mode("overwrite").parquet(corpusPath)
      println(f"SIMJOIN corpus write ($rows docs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } else println("SIMJOIN corpus: exists, skipped")
    val corpus = spark.read.parquet(corpusPath)

    // (a) per-doc hashed shingle arrays (the at-rest index shape)
    val docsh = Dedup.shingleArrays(corpus, "doc_id", "text", 3).cache()
    val (nDocs, bBuild, sBuild) = Probe.withShuffleBytes(spark)(docsh.count())
    println(f"SIMJOIN shingle build: $sBuild%.2f s, $nDocs docs, shuffle ${bBuild / 1e6}%.1f MB")

    // (b) prefix-filtered candidates — the blocking-ratio witness
    val (nCand, bCand, sCand) = Probe.withShuffleBytes(spark) {
      Dedup.prefixCandidates(docsh, 0.5).count()
    }
    val n2 = rows.toDouble * (rows - 1) / 2
    val d = dupRate
    val expectedTrue = distinctDocs.toDouble * ((d - 1).toDouble * (d - 2) / 2 + (d - 1))
    println(f"SIMJOIN candidates (t=0.5): $sCand%.2f s, $nCand pairs, shuffle ${bCand / 1e6}%.1f MB")
    println(f"SIMJOIN blocking ratio: $nCand%d of ${n2}%.2e possible = ${nCand / n2}%.2e of N^2/2")

    // (c) the full exact join — every expected pair must surface
    val (nPairs, bJoin, sJoin) = Probe.withShuffleBytes(spark) {
      Dedup.prefixJaccardPairs(corpus, "doc_id", "text", 0.5).count()
    }
    println(f"SIMJOIN exact pairs: $sJoin%.2f s, $nPairs found, expected ${expectedTrue}%.0f, shuffle ${bJoin / 1e6}%.1f MB")
    if (nPairs != expectedTrue.toLong)
      println(s"SIMJOIN WARNING: found $nPairs != expected ${expectedTrue.toLong}")

    // (d) the exact-dup pre-collapsed composition: identical pair set,
    // but the prefix/verify machinery runs over DISTINCT texts only —
    // at high dupRate (exact-copy-dominated corpora) the raw path's
    // posting lists scale with copies while this stays flat in
    // rows/dupRate + the (inherent, output-side) expansion joins
    val (nPairsC, bJoinC, sJoinC) = Probe.withShuffleBytes(spark) {
      Dedup.prefixJaccardPairsCollapsed(corpus, "doc_id", "text", 0.5).count()
    }
    println(f"SIMJOIN collapsed pairs: $sJoinC%.2f s, $nPairsC found, shuffle ${bJoinC / 1e6}%.1f MB")
    if (nPairsC != nPairs)
      println(s"SIMJOIN WARNING: collapsed $nPairsC != raw $nPairs")
    spark.stop()
  }
}
