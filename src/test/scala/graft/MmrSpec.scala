package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the greedy MMR selection ([[Mmr.select]]) — the
  * driver-side stage the end-to-end oracle gate (`search_mmr`) can only
  * exercise on whatever score distribution the gate corpus happens to
  * produce. These pin the contract points directly: the smaller-id
  * tie-break, the λ penalty actually displacing a redundant candidate,
  * k > pool, and NaN-score tolerance (the ADVICE r11 crash path).
  */
class MmrSpec extends AnyFunSuite {

  test("exact mmr-score tie breaks on the smaller id") {
    // two candidates with identical relevance and no pairwise sim:
    // first pick scores tie exactly; id 3 must win over id 7
    val rel = Seq(7L -> 0.9, 3L -> 0.9)
    val picked = Mmr.select(rel, Map.empty, k = 2, lambda = 0.7)
    assert(picked.map(_._1) == Seq(3L, 7L))
  }

  test("λ penalty displaces a near-duplicate of the first pick") {
    // b is a clone of a (sim 1.0); c is unrelated but less relevant.
    // Pure relevance would rank a, b, c; MMR at λ=0.7 must pick a then c:
    //   b: 0.7*0.98 - 0.3*1.0 = 0.386 < c: 0.7*0.60 - 0.3*0.0 = 0.42
    val rel = Seq(1L -> 1.0, 2L -> 0.98, 3L -> 0.60)
    val sim = Map((1L, 2L) -> 1.0, (1L, 3L) -> 0.0, (2L, 3L) -> 0.0)
    val picked = Mmr.select(rel, sim, k = 2, lambda = 0.7)
    assert(picked.map(_._1) == Seq(1L, 3L))
    // and with λ=1.0 (no penalty) the pure-relevance order comes back
    val pure = Mmr.select(rel, sim, k = 2, lambda = 1.0)
    assert(pure.map(_._1) == Seq(1L, 2L))
  }

  test("k larger than the pool returns the whole pool, relevance-ordered") {
    val rel = Seq(5L -> 0.2, 6L -> 0.8)
    val picked = Mmr.select(rel, Map.empty, k = 10, lambda = 0.7)
    assert(picked.map(_._1) == Seq(6L, 5L))
  }

  test("NaN relevance is skipped, never selected, never crashes") {
    val rel = Seq(1L -> Double.NaN, 2L -> 0.5, 3L -> Double.NaN, 4L -> 0.4)
    val picked = Mmr.select(rel, Map.empty, k = 4, lambda = 0.7)
    assert(picked.map(_._1) == Seq(2L, 4L))
  }

  test("all-NaN pool terminates with an empty selection") {
    val rel = Seq(1L -> Double.NaN, 2L -> Double.NaN)
    assert(Mmr.select(rel, Map.empty, k = 2, lambda = 0.7).isEmpty)
  }

  test("NaN pairwise similarity poisons the penalty, not the query") {
    // id 2's sim to the first pick is NaN → its mmr score is NaN →
    // skipped; id 3 (clean) is selected instead
    val rel = Seq(1L -> 1.0, 2L -> 0.9, 3L -> 0.5)
    val sim = Map((1L, 2L) -> Double.NaN, (1L, 3L) -> 0.1, (2L, 3L) -> 0.2)
    val picked = Mmr.select(rel, sim, k = 2, lambda = 0.7)
    assert(picked.map(_._1) == Seq(1L, 3L))
  }
}
