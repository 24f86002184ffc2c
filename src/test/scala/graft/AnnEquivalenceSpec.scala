package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the claim behind the ann-family equivalence oracles: at the
  * correctness-gate SFs, each index's output is ROW-IDENTICAL to the
  * brute-force top-5 (ann_nsw / ann_hnsw / ann_pq / ann_ivf_kmeans) or
  * to the exact IVF search over the same coarse quantizer (ann_ivfpq
  * vs ann_ivf). That identity is what licenses sharing knn_brute's /
  * ann_ivf's DuckDB SQL as their oracle — if an index, rerank width,
  * or probe width change breaks the identity, this spec fails before
  * the driver's gate does.
  *
  * sf0.01 is the driver's CORRECTNESS SF; sf0.001 is the cheap canary.
  */
class AnnEquivalenceSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def rows(name: String, sf: String): Seq[org.apache.spark.sql.Row] =
    Queries.all(name)(spark, sf).collect().toSeq

  for (sf <- sfs) {
    lazy val brute = rows("knn_brute", sf)

    for (name <- Seq("ann_nsw", "ann_hnsw", "ann_pq", "ann_ivf_kmeans")) {
      test(s"$name == brute top-5 at $sf") {
        assert(rows(name, sf) == brute)
      }
    }

    test(s"ann_ivfpq == exact stride-IVF (ann_ivf) at $sf") {
      assert(rows("ann_ivfpq", sf) == rows("ann_ivf", sf))
    }

    test(s"ann_ivf_append (base + appended delta layout) == ann_ivf at $sf") {
      // same frozen centroids, same probe; base ∪ appended delta must
      // serve exactly what the one-pass layout serves — the O(delta)
      // ingest claim is this row identity (IndexAppendSpec pins the
      // underlying assignment equality)
      assert(rows("ann_ivf_append", sf) == rows("ann_ivf", sf))
    }

    test(s"ann_ivf_rule (optimizer centroid probe) == ann_ivf at $sf") {
      // same centroids (stride 53), same probe ranking, same assignment
      // tie-breaks — the rule path must reproduce the hand-built IVF
      // search row-for-row, which licenses sharing ann_ivf's oracle
      assert(rows("ann_ivf_rule", sf) == rows("ann_ivf", sf))
    }
  }
}
