package graft.queries

import graft.SparkSpec
import graft.ops.KMeans
import org.apache.spark.sql.functions._

/** q122 IVF-PQ behavior beyond the oracle: exact parity with an
  * independent driver-side reference of the full composition (trained
  * coarse route → residual → shared-codebook encode → per-probe ADC
  * shortlist → exact refine → top-5), the cell-pruning property the
  * layout exists for, the measured recall floor the refine stage buys,
  * and the plan shape (coded corpus streams, distance tables
  * broadcast).
  *
  * The coarse codebook is taken FROM ops/KMeans (the composition under
  * test); KMeansSpec independently pins that trainer (VecSum ≡
  * explode-sum, run-twice determinism), so seeding the driver-side
  * reference with the engine's centroids keeps every DOWNSTREAM stage
  * independently recomputed.
  */
class IvfPqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val M = 8 // subspaces
  private val D = 8 // dims per subspace
  private val K = 8 // codewords per subspace
  private val C = 8 // coarse cells
  private val NP = 2 // probes per query
  private val SL = 50 // ADC shortlist per query
  private val dim = 64

  private def quantized: Map[Long, Array[Long]] = quantizedAt(sf)

  private def quantizedAt(dir: String): Map[Long, Array[Long]] =
    graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap

  private def trainedCoarse: Array[Array[Double]] = trainedCoarseAt(sf)

  private def trainedCoarseAt(dir: String): Array[Array[Double]] = {
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))
    val (_, cents) = KMeans.run(e, C, dim, 3)
    cents.orderBy("cid").collect().map(_.getSeq[Double](1).toArray)
  }

  // Pinned folds: ascending index, seed 0.0 — the engine's order.
  private def fullDist(x: Array[Long], cv: Array[Double]): Double = {
    var s = 0.0d; var i = 0
    while (i < dim) { val d = x(i).toDouble - cv(i); s += d * d; i += 1 }
    s
  }
  private def exactDist(x: Array[Long], y: Array[Long]): Double = {
    var s = 0.0d; var i = 0
    while (i < dim) { val d = x(i).toDouble - y(i).toDouble; s += d * d; i += 1 }
    s
  }
  private def subDist(r: Array[Double], j: Int, mu: Array[Double]): Double = {
    var s = 0.0d; var i = 0
    while (i < D) { val d = r(j * D + i) - mu(i); s += d * d; i += 1 }
    s
  }

  /** Every stage past training, driver-side. Returns (top5 rows,
    * per-vector cell assignment, candidate counts per query). */
  private def reference(vecs: Map[Long, Array[Long]],
      coarse: Array[Array[Double]], np: Int, sl: Int)
      : (Seq[(Long, Int, Long, Double, Double)], Map[Long, Int], Map[Long, Int]) = {
    def route(x: Array[Long]): Seq[(Double, Int)] =
      (0 until C).map(c => (fullDist(x, coarse(c)), c)).sorted
    val assign = vecs.map { case (id, x) => id -> route(x).head._2 }
    def residual(x: Array[Long], cell: Int): Array[Double] =
      Array.tabulate(dim)(i => x(i).toDouble - coarse(cell)(i))
    val cb = Array.tabulate(M, K) { (j, c) =>
      val r = residual(vecs(c.toLong), assign(c.toLong))
      Array.tabulate(D)(i => r(j * D + i))
    }
    def encode(r: Array[Double]): Array[Int] =
      Array.tabulate(M) { j =>
        var bd = Double.PositiveInfinity; var bc = -1
        for (c <- 0 until K) {
          val d = subDist(r, j, cb(j)(c))
          if (d < bd) { bd = d; bc = c }
        }
        bc
      }
    val codes = vecs.map { case (id, x) =>
      id -> encode(residual(x, assign(id)))
    }
    var cands = Map.empty[Long, Int]
    val rows = (0L until 10L).flatMap { q =>
      val probed = route(vecs(q)).take(np).map(_._2)
      val scored = probed.flatMap { cell =>
        val qr = residual(vecs(q), cell)
        val dtab = Array.tabulate(M, K)((j, c) => subDist(qr, j, cb(j)(c)))
        codes.toSeq.collect { case (v, cd) if v != q && assign(v) == cell =>
          var s = 0.0d
          for (j <- 0 until M) s += dtab(j)(cd(j))
          (v, s)
        }
      }
      cands += q -> scored.size
      val shortlist = scored.sortBy { case (v, s) => (s, v) }.take(sl)
      val refined = shortlist.map { case (v, ad) =>
        (v, ad, exactDist(vecs(q), vecs(v)))
      }
      refined.sortBy { case (v, _, d) => (d, v) }.take(5).zipWithIndex.map {
        case ((v, ad, d), r) => (q, r + 1, v, ad, d)
      }
    }
    (rows, assign, cands)
  }

  /** The engine's corpus-aware shortlist rule, mirrored. */
  private def slFor(n: Int): Int = math.max(SL, n / C)

  test("q122 equals an independent driver-side IVF-PQ reference bit for bit") {
    val vecs = quantized
    val (expected, _, _) = reference(vecs, trainedCoarse, NP, slFor(vecs.size))
    val got = ClusterOps.q122IvfPq.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
      .toSeq
    assert(got == expected)
  }

  test("routing prunes the scan: candidates are the probed cells only, well under the corpus") {
    val vecs = quantized
    val (_, assign, cands) = reference(vecs, trainedCoarse, NP, slFor(vecs.size))
    val n = vecs.size
    val cellSizes = assign.groupBy(_._2).map { case (c, m) => c -> m.size }
    assert(cellSizes.size == C, s"degenerate routing: ${cellSizes.size} cells used")
    cands.foreach { case (q, k) =>
      assert(k < n, s"query $q scanned the whole corpus ($k of $n)")
    }
    // the aggregate scan fraction is what the nprobe/cells dial promises
    // (±, cells are not perfectly balanced): measured 0.26 at sf0.001
    val frac = cands.values.sum.toDouble / (cands.size.toDouble * n)
    assert(frac <= 0.55, s"scan fraction $frac — routing is not pruning")
  }

  test("the refine stage lifts recall@5 above the measured floor") {
    val vecs = quantized
    val (rows, _, _) = reference(vecs, trainedCoarse, NP, slFor(vecs.size))
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val exact = (0L until 10L).map { q =>
      val top = vecs.toSeq.collect { case (v, x) if v != q =>
        (v, exactDist(vecs(q), x))
      }.sortBy { case (v, d) => (d, v) }.take(5).map(_._1).toSet
      q -> top
    }.toMap
    val recall = (0L until 10L).map(q => (got(q) & exact(q)).size).sum / 50.0
    // measured 0.84 at sf0.001 with the corpus-aware shortlist
    // (max(50, 500/8) = 62; vs 0.12 for ADC-only ranking — the refine
    // stage IS the recall); the 0.8 floor is the round-12 contract
    assert(recall >= 0.8, s"IVF-PQ refined recall $recall fell under the floor")
    // the 0.12 half of that claim, pinned rather than asserted in prose:
    // a shortlist of exactly 5 makes the refine a no-op on the SET, so
    // reference(np, 5) yields the ADC-only top-5 per query
    val (adcRows, _, _) = reference(vecs, trainedCoarse, NP, 5)
    val adcGot = adcRows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val adcRecall = (0L until 10L).map(q => (adcGot(q) & exact(q)).size).sum / 50.0
    assert(adcRecall < recall,
      s"refine adds nothing: ADC-only $adcRecall vs refined $recall")
    assert(adcRecall <= 0.5,
      s"ADC-only recall $adcRecall unexpectedly high — distance tables may be leaking exact distances")
  }

  test("q122 plan: coded corpus streams, distance tables broadcast, probe join keyed on cell_id") {
    val plan = ClusterOps.q122IvfPq.fn(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("BroadcastHashJoin [cell_id"),
      s"probe join is not a broadcast hash join on cell_id:\n$plan")
  }

  test("recall at sf0.1: the corpus-aware shortlist holds the 0.8 floor across the decade") {
    // At FIXED dials (nprobe=2, shortlist=50) recall@5 fell 0.82 → 0.60
    // over this 4× corpus step — the round-11 finding. The corpus-aware
    // rule max(50, N/cells) (shortlist 250 at N=2000) restores 0.80:
    // the refine stage sees a constant FRACTION of each probed list,
    // not a constant row count. The measurement grid also showed
    // nprobe=3/4 at fixed shortlist can LOWER recall (ADC noise
    // competes for shortlist slots), which is why only shortlist
    // scales. Same floor as the sf0.001 test: the dial rule is the
    // contract, at both decades.
    val vecs = quantizedAt("/root/testdata/sf0.1")
    val (rows, _, _) = reference(vecs,
      trainedCoarseAt("/root/testdata/sf0.1"), NP, slFor(vecs.size))
    val got = rows.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val exact = (0L until 10L).map { q =>
      val top = vecs.toSeq.collect { case (v, x) if v != q =>
        (v, exactDist(vecs(q), x))
      }.sortBy { case (v, d) => (d, v) }.take(5).map(_._1).toSet
      q -> top
    }.toMap
    val recall = (0L until 10L).map(q => (got(q) & exact(q)).size).sum / 50.0
    assert(recall >= 0.8, s"IVF-PQ refined recall at sf0.1: $recall under the floor")
  }
}
