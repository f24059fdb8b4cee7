package graft.queries

import graft.SparkSpec
import graft.ops.KMeans
import org.apache.spark.sql.functions._

/** q119 product-quantization behavior beyond the oracle: exact parity
  * with an independent driver-side reference implementation, and the
  * codebook-training composition (q117's k-means per subspace must not
  * increase encode distortion — Lloyd's guarantee, delivered through
  * the same ops/KMeans the IVF story advertises).
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val M = 8 // subspaces
  private val D = 8 // dims per subspace
  private val K = 8 // codewords

  private def quantized: Map[Long, Array[Long]] =
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap

  private def subDist(x: Array[Long], j: Int, mu: Array[Double]): Double = {
    var s = 0.0d
    var i = 0
    while (i < D) {
      val d = x(j * D + i).toDouble - mu(i)
      s += d * d
      i += 1
    }
    s
  }

  test("q119 equals an independent driver-side PQ-ADC reference bit for bit") {
    val vecs = quantized
    // sampled codebook: sub-vectors of vecs 0..7, as exact doubles
    val cb = Array.tabulate(M, K) { (j, c) =>
      Array.tabulate(D)(i => vecs(c.toLong)(j * D + i).toDouble)
    }
    def encode(x: Array[Long]): Array[Int] =
      Array.tabulate(M) { j =>
        var bd = Double.PositiveInfinity
        var bc = -1
        for (c <- 0 until K) {
          val d = subDist(x, j, cb(j)(c))
          if (d < bd) { bd = d; bc = c }
        }
        bc
      }
    val codes = vecs.map { case (id, x) => id -> encode(x) }
    val expected = (0L until 10L).flatMap { q =>
      val dtab = Array.tabulate(M, K)((j, c) => subDist(vecs(q), j, cb(j)(c)))
      val scored = codes.toSeq.collect { case (v, cd) if v != q =>
        // same fold order as the engine: subspaces ascending, seed 0.0
        var s = 0.0d
        for (j <- 0 until M) s += dtab(j)(cd(j))
        (v, s)
      }
      scored.sortBy { case (v, s) => (s, v) }.take(5).zipWithIndex.map {
        case ((v, s), r) => (q, r + 1, v, s)
      }
    }
    val got = ClusterOps.q119PqAdc.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("k-means-trained subspace codebooks do not increase encode distortion") {
    val e = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))
      .persist()
    def distortion(cbs: Array[Array[Array[Double]]]): Double = {
      val vecs = e.collect().map(r => r.getSeq[Long](1).toArray)
      vecs.map { x =>
        (0 until M).map { j =>
          (0 until K).map(c => subDist(x, j, cbs(j)(c))).min
        }.sum
      }.sum
    }
    // sampled codebook (what q119 ships)
    val raw = e.filter(col("vec_id") < K).orderBy("vec_id").collect()
      .map(_.getSeq[Long](1).toArray)
    val sampled = Array.tabulate(M, K) { (j, c) =>
      Array.tabulate(D)(i => raw(c)(j * D + i).toDouble)
    }
    // trained: ops/KMeans per subspace over the sub-vectors — the
    // composition the q119/q60 scaladocs advertise
    val trained = Array.tabulate(M) { j =>
      val sub = e.select(col("vec_id"),
        expr(s"slice(xq, ${j * D + 1}, $D)").as("xq"))
      val (_, cents) = KMeans.run(sub, K, D, 2)
      cents.orderBy("cid").collect()
        .map(_.getSeq[Double](1).toArray)
    }
    val ds = distortion(sampled)
    val dt = distortion(trained)
    assert(dt <= ds, s"trained distortion $dt > sampled $ds")
    e.unpersist()
  }
}
