package graft

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Media-dedup at 1M images: proves the banded-Hamming phash path at
  * three orders of magnitude past the gate corpus (sf0.1 = 5k docs).
  * The corpus is 1M synthetic-but-really-decoded P5 images — `dupRate`
  * exact copies of N/dupRate distinct images, ids distinct — so the
  * probe measures BOTH claims:
  *   - decode+fingerprint is a linear scan (mapPartitions over the
  *     real codec) whose output is 8 bytes/image regardless of pixel
  *     count — the join input never contains pixels;
  *   - the 4×16-bit banded self-join surfaces the ~N·C(dupRate,2)/
  *     dupRate true duplicate pairs WITHOUT a cartesian: candidate
  *     pairs are reported against N²/2 to show the blocking ratio.
  * Also prints shuffle bytes for the pair stage (the 8 B/image claim,
  * measured rather than asserted).
  * Usage: runMain graft.PhashScaleProbe [rows] [dupRate]
  */
object PhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 1000000L
    val dupRate = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val distinctImages = rows / dupRate
    // text drives the pixels. It must be HIGH-ENTROPY: a first cut
    // used decimal id strings, and digit-cycled pixels aliased 1M
    // images onto 50 distinct aHashes (one hash held 441k rows — the
    // banded join degenerates to a cartesian). 48 splitmix64-derived
    // printable chars give ~uniform pixel bytes, so the 64 aHash bits
    // are coin flips: 250k distinct images → essentially 250k distinct
    // hashes, and band buckets stay rice-sized.
    val textUdf = udf { (img: Long) =>
      val sb = new java.lang.StringBuilder(48)
      var i = 0
      while (i < 48) {
        var x = img * 64L + i + 0x9E3779B97F4A7C15L
        x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
        x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
        x ^= (x >>> 31)
        sb.append((33 + java.lang.Math.floorMod(x, 94L).toInt).toChar)
        i += 1
      }
      sb.toString
    }
    // the cache path is KEYED on the arguments: a corpus cached from a
    // previous run with different rows/dupRate would silently feed the
    // expected-pair and blocking-ratio math below, which is computed
    // from THIS run's arguments
    val corpusPath = s"target/phash-probe/corpus-$rows-$dupRate"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      spark.range(rows)
        .select(col("id").as("doc_id"),
          Multimodal.syntheticPgmUdf(textUdf(col("id") % distinctImages)).as("blob"))
        .write.mode("overwrite").parquet(corpusPath)
      println(f"PHASH corpus write (${rows} P5 blobs): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    } else println("PHASH corpus: exists, skipped")
    val corpus = spark.read.parquet(corpusPath)

    // (a) decode + fingerprint: real parser, 8 bytes out per image
    val hashPath = "target/phash-probe/hashes"
    val (nHashes, bFp, sFp) = Probe.withShuffleBytes(spark) {
      Multimodal.imagePhashes(spark, corpus, "doc_id", "blob")
        .write.mode("overwrite").parquet(hashPath)
      spark.read.parquet(hashPath).count()
    }
    println(f"PHASH decode+fingerprint: $sFp%.2f s, $nHashes hashes, shuffle ${bFp / 1e6}%.1f MB (scan stage: expect ~0)")

    val hashes = spark.read.parquet(hashPath)
    // (b) banded-Hamming pair join on the 8-byte hashes
    val (nPairs, bPairs, sPairs) = Probe.withShuffleBytes(spark) {
      Dedup.hammingBandPairs(hashes, "doc_id", "phash", maxHamming = 3).count()
    }
    val n2 = rows.toDouble * (rows - 1) / 2
    val expectedTrue = distinctImages.toDouble * dupRate * (dupRate - 1) / 2
    println(f"PHASH banded pairs (maxHamming=3): $sPairs%.2f s, $nPairs pairs, shuffle ${bPairs / 1e6}%.1f MB")
    println(f"PHASH expected exact-copy pairs >= ${expectedTrue}%.0f (C($dupRate,2) per distinct image)")
    println(f"PHASH blocking ratio: $nPairs%d verified of ${n2}%.2e possible = ${nPairs / n2}%.2e of N^2/2")
    spark.stop()
  }
}
