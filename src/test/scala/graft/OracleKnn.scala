package graft

/** In-test exact oracle: a faithful Scala port of the reference's
  * pure-Python `BruteForceIndexPure` (brute_force.py:50-91) — the twin
  * the reference kept "for reference/testing". Row-at-a-time, no Spark.
  */
object OracleKnn {

  def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n) // zero vector unchanged (brute_force.py:10-11)
  }

  def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  /** Returns (index, score) sorted by score desc, ties by insertion
    * order (Python stable sort), truncated to min(k, n).
    * Raises on dim mismatch like brute_force.py:36-37.
    */
  def search(rows: Seq[Array[Double]], query: Array[Double], k: Int): Seq[(Int, Double)] = {
    if (k <= 0 || rows.isEmpty) return Nil
    val dim = rows.head.length
    require(query.length == dim, s"Query dim ${query.length} != index dim $dim")
    val normalized = rows.map(unit)
    val q = unit(query)
    val scored = normalized.zipWithIndex.map { case (v, i) => (i, dot(q, v)) }
    scored.sortBy { case (i, s) => (-s, i) }.take(math.min(k, rows.size))
  }
}
