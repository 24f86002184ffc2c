package graft

/** Prices the IVF re-clustering cadence (r14 verdict #5, open thread
  * #2): `ann_ivf_append` freezes centroids by contract — assignment of
  * a delta with the trained centroids keeps ingest O(delta) — but a
  * delta whose DISTRIBUTION drifts from the training corpus degrades
  * recall until re-clustering. This probe measures the decay curve and
  * the recovery:
  *
  *  - BASE corpus: the gate fixture's mixture family (25 unit-norm
  *    centers seeded 0xC0FFEE, σ=0.1 — within-cluster cos ≈ 0.8);
  *  - DELTA: the same mixture shape with MOVED means (a different
  *    center seed — a fully drifted arrival distribution, the
  *    worst-case "new product launch" ingest);
  *  - centroids trained ONCE on the base (the gates' stride-sample
  *    rule, ~67 centroids ≈ 2.7× the cluster count), then frozen while
  *    the delta appends at ratios 0 → 100% of base;
  *  - recall@10 at nprobe=4 reported separately for queries drawn from
  *    the DELTA (the rows a frozen quantizer serves worst) and from
  *    the BASE (collateral damage check), plus the candidate-scan
  *    fraction (drifted rows piling into few clusters makes probes
  *    cheaper-looking but blinder);
  *  - at the largest ratio, centroids are RE-TRAINED on the combined
  *    corpus with the same rule — the recall delta between frozen and
  *    re-trained at that point IS the price of not re-clustering, and
  *    the ratio where frozen recall_new crosses ~0.75 (the decision
  *    table's clustered-recall bar) is the re-cluster trigger.
  *
  * Driver-side on purpose: the quantities are pure functions of
  * (centroids, vectors) — 32k × 64-d fits in a few MB and the
  * assignment math is [[graft.index.IvfKnn.rankClusters]]'s, so no
  * Spark session is needed to price the model; the ENGINE path is
  * gated by ann_ivf_append/ann_ivf_rule_clustered.
  *
  * Usage: runMain graft.IvfDriftProbe [baseN] [clusters] [sigma]
  */
object IvfDriftProbe {

  private val dim = 64

  /** One mixture point: unit-norm center (seeded per cluster from
    * `centerSeed`) + σ·N(0,I) noise (seeded per global id) — exactly
    * [[LshSweep.gaussianMixture]]'s math with the center seed
    * parameterized so the delta's means can MOVE. */
  private def point(centerSeed: Long, id: Long, clusters: Int,
                    sigma: Double): Array[Float] = {
    val c = id % clusters
    val center = Array.tabulate(dim)(i => LshSweep.gauss(centerSeed + c, i))
    val cn = math.sqrt(center.map(x => x * x).sum)
    Array.tabulate(dim)(i => (center(i) / cn + sigma * LshSweep.gauss(0xBEEFL + id, i)).toFloat)
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < dim) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** argmax-cosine assignment (+ its score), lowest-index tie-break —
    * the [[graft.index.IvfKnn.assign]] rule on driver arrays. The
    * SCORE is the probe's online trigger signal: it is computed for
    * free at ingest time (assignment already evaluates it), needs no
    * ground truth, and drops sharply exactly when arrivals drift away
    * from every trained centroid. */
  private def assign(v: Array[Float], cents: Array[Array[Float]]): (Int, Double) = {
    var best = 0; var bestS = Double.NegativeInfinity; var c = 0
    while (c < cents.length) {
      val s = cosine(v, cents(c)); if (s > bestS) { bestS = s; best = c }; c += 1
    }
    (best, bestS)
  }

  private def topKIds(q: Int, pool: Array[Int], vecs: Array[Array[Float]],
                      k: Int): Set[Int] =
    pool.filter(_ != q)
      .map(i => (i, cosine(vecs(q), vecs(i))))
      .sortBy { case (i, s) => (-s, i) }
      .take(k).map(_._1).toSet

  def main(args: Array[String]): Unit = {
    val baseN = if (args.nonEmpty) args(0).toInt else 16000
    val clusters = if (args.length > 1) args(1).toInt else 25
    val sigma = if (args.length > 2) args(2).toDouble else 0.1
    val k = 10; val nprobe = 4
    val stride = 241 // prime, coprime with `clusters`: cycles ALL clusters

    val base = Array.tabulate(baseN)(i => point(0xC0FFEEL, i.toLong, clusters, sigma))
    // moved means: a disjoint center seed; noise ids offset past base
    val delta = Array.tabulate(baseN)(i =>
      point(0x51F7EDL, 1000000L + i, clusters, sigma))

    def trainCents(vecs: Array[Array[Float]]): Array[Array[Float]] =
      vecs.indices.collect { case i if i % stride == 0 => vecs(i) }.toArray

    val frozen = trainCents(base)
    println(s"""PROBE base=$baseN clusters=$clusters sigma=$sigma cents=${frozen.length} nprobe=$nprobe k=$k""")

    def measure(tag: String, ratio: Double, cents: Array[Array[Float]]): String = {
      val dN = (ratio * baseN).toInt
      val vecs = base ++ delta.take(dN)
      val assignedScored = vecs.map(v => assign(v, cents))
      val assigned = assignedScored.map(_._1)
      val byCluster = assigned.zipWithIndex.groupMap(_._1)(_._2)
      def meanAssignCos(ids: Range): Double =
        if (ids.isEmpty) -1.0
        else ids.map(i => assignedScored(i)._2).sum / ids.size
      // hash-sampled queries (never an arithmetic stride — the r12
      // sweep catch: strides sharing a factor with `clusters` sample
      // one cluster's geometry)
      def sample(ids: Range, n: Int): Array[Int] =
        ids.filter(i => math.floorMod(
          graft.functions.TextFunctions.splitmix64(i.toLong * 0x9E37L), 100) < 15)
          .take(n).toArray
      val qOld = sample(0 until baseN, 60)
      val qNew = if (dN == 0) Array.empty[Int] else sample(baseN until baseN + dN, 60)
      def recallOf(qs: Array[Int]): (Double, Double) = {
        if (qs.isEmpty) return (-1.0, 0.0)
        var rSum = 0.0; var scanSum = 0.0
        qs.foreach { q =>
          val probe = cents.indices
            .map(c => (c, cosine(vecs(q), cents(c))))
            .sortBy { case (c, s) => (-s, c) }
            .take(nprobe).map(_._1)
          val pool = probe.flatMap(c => byCluster.getOrElse(c, Array.empty[Int])).toArray
          val got = topKIds(q, pool, vecs, k)
          val want = topKIds(q, vecs.indices.toArray, vecs, k)
          rSum += got.intersect(want).size.toDouble / k
          scanSum += pool.length.toDouble / vecs.length
        }
        (rSum / qs.length, scanSum / qs.length)
      }
      val (rNew, scanNew) = recallOf(qNew)
      val (rOld, scanOld) = recallOf(qOld)
      val acNew = meanAssignCos(baseN until baseN + dN)
      val acOld = meanAssignCos(0 until baseN)
      f"""{"probe":"ivf_drift","arm":"$tag","delta_pct":${(ratio * 100).toInt},"recall_new":$rNew%.3f,"recall_base":$rOld%.3f,"assign_cos_new":$acNew%.3f,"assign_cos_base":$acOld%.3f,"scan_frac_new":$scanNew%.4f,"scan_frac_base":$scanOld%.4f,"n_cents":${cents.length}}"""
    }

    Seq(0.0, 0.125, 0.25, 0.5, 1.0).foreach { r =>
      println(measure("frozen", r, frozen))
    }
    // recovery: re-train on the combined corpus at the largest ratio
    val retrained = trainCents(base ++ delta)
    println(measure("retrained", 1.0, retrained))
  }
}
