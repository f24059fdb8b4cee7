package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q120 behavior beyond the oracle: the hash-vs-string collision audit
  * (the Spark side joins postings on xxhash64(gram); a collision would
  * silently merge two grams' scores), an independent driver-side
  * recomputation, and the int64 overflow headroom the scaladoc claims.
  */
class SparseRetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def gramTf(dir: String) = graft.Tables.documentsSpread(spark, dir)
    .select(col("doc_id"),
      expr("filter(split(lower(text), ' '), t -> t <> '')").as("ts"))
    .filter(size(col("ts")) >= 3)
    .select(col("doc_id"),
      explode(graft.functions.GraftFunctions.ngrams(col("ts"), 3)).as("g"))

  test("hash-keyed match join equals a string-keyed one (collision audit)") {
    def scored(key: org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
      val tf = gramTf(sf).select(col("doc_id"), key(col("g")).as("h"))
        .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
      val ndocs = graft.Tables.documents(spark, sf).agg(count(lit(1)).as("n"))
      val wt = tf.groupBy(col("h")).agg(count(lit(1)).as("df"))
        .join(broadcast(ndocs))
        .filter(col("df") * 4 <= col("n"))
        .select(col("h"), expr("(n * 256) div df").as("wt"))
      val postings = tf.join(wt, "h")
      val qside = postings.filter(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("h"), col("tf").as("tfq"))
      postings.join(broadcast(qside), "h")
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(sum(col("tfq") * col("tf") * col("wt")).as("score"),
          count(lit(1)).as("n_shared"))
        .orderBy(col("query_id"), col("doc_id"))
        .collect().toSeq
    }
    assert(scored(xxhash64(_)) == scored(identity))
  }

  test("q120 equals an independent driver-side accumulator at sf0.001") {
    val small = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, small)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty)).toMap
    val n = docs.size.toLong
    val grams = docs.collect { case (d, ts) if ts.length >= 3 =>
      d -> ts.sliding(3).map(_.mkString(" ")).toSeq
    }
    val tf = grams.map { case (d, gs) =>
      d -> gs.groupBy(identity).map { case (g, o) => g -> o.length.toLong }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (g, o) => g -> o.size.toLong }
    val wt = df.collect { case (g, f) if f * 4 <= n => g -> (n * 256) / f }
    val expected = (0L until 10L).flatMap { q =>
      val qtf = tf.getOrElse(q, Map.empty).filter { case (g, _) => wt.contains(g) }
      val scored = tf.toSeq.collect { case (d, dtf) if d != q =>
        val shared = qtf.keySet.intersect(dtf.keySet.filter(wt.contains))
        val score = shared.toSeq.map(g => qtf(g) * dtf(g) * wt(g)).sum
        (d, score, shared.size.toLong)
      }.filter(_._3 >= 1)
      scored.sortBy { case (d, s, _) => (-s, d) }.take(5).zipWithIndex.map {
        case ((d, s, ns), r) => (q, r + 1, d, s, ns)
      }
    }
    val got = ClusterOps.q120SparseRetrieval.fn(spark, small).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
  }

  test("q121 equals a driver-side RRF of independently recomputed dense+sparse arms") {
    val small = "/root/testdata/sf0.001"
    // dense arm: exact cosine, same pinned fold order as dot_f
    val vecs = graft.Tables.embeddings(spark, small)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def dotp(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dotp(v, v)) }
    val dense = (0L until 10L).flatMap { q =>
      vecs.keys.toSeq.filter(_ != q)
        .map(v => (v, dotp(vecs(q), vecs(v)) / (nrm(q) * nrm(v))))
        .sortBy { case (v, c) => (-c, v) }.take(20).zipWithIndex
        .map { case ((v, _), r) => (q, v) -> (r + 1) }
    }.toMap
    // sparse arm: same accumulator as the q120 reference test
    val docs = graft.Tables.documents(spark, small)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty)).toMap
    val n = docs.size.toLong
    val tf = docs.collect { case (d, ts) if ts.length >= 3 =>
      d -> ts.sliding(3).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, o) => g -> o.length.toLong }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (g, o) => g -> o.size.toLong }
    val wts = df.collect { case (g, f) if f * 4 <= n => g -> (n * 256) / f }
    val sparse = (0L until 10L).flatMap { q =>
      val qtf = tf.getOrElse(q, Map.empty).filter { case (g, _) => wts.contains(g) }
      tf.toSeq.collect { case (d, dtf) if d != q =>
        val shared = qtf.keySet.intersect(dtf.keySet.filter(wts.contains))
        (d, shared.toSeq.map(g => qtf(g) * dtf(g) * wts(g)).sum, shared.size)
      }.filter(_._3 >= 1)
        .sortBy { case (d, s, _) => (-s, d) }.take(20).zipWithIndex
        .map { case ((d, _, _), r) => (q, d) -> (r + 1) }
    }.toMap
    val expected = (0L until 10L).flatMap { q =>
      val cands = (dense.keySet ++ sparse.keySet).filter(_._1 == q).map(_._2)
      cands.toSeq.map { v =>
        val rd = dense.getOrElse((q, v), 0)
        val rs = sparse.getOrElse((q, v), 0)
        val fused = (if (rd > 0) 1.0d / (60 + rd) else 0.0d) +
          (if (rs > 0) 1.0d / (60 + rs) else 0.0d)
        (v, fused, rd, rs)
      }.sortBy { case (v, f, _, _) => (-f, v) }.take(5).zipWithIndex.map {
        case ((v, f, rd, rs), r) => (q, r + 1, v, f, rd, rs)
      }
    }
    val got = ClusterOps.q121HybridRrf.fn(spark, small).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getInt(4), r.getInt(5))).toSeq
    assert(got == expected)
  }

  test("int64 overflow headroom: max score carries >= 2^10 margin at this SF") {
    val maxScore = ClusterOps.q120SparseRetrieval.fn(spark, sf)
      .agg(max(col("score"))).collect()(0).getLong(0)
    assert(maxScore < Long.MaxValue / 1024,
      s"score $maxScore within 2^10 of int64 overflow — revisit the wt scale")
  }

  test("q137 equals an independent driver-side BM25 at sf0.001, scores bit-for-bit") {
    val small = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, small)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1)
        .filter(_.nonEmpty)).toMap
    val n = docs.size.toLong
    val grams = docs.collect { case (d, ts) if ts.length >= 3 =>
      d -> ts.sliding(3).map(_.mkString(" ")).toSeq
    }
    val tf = grams.map { case (d, gs) =>
      d -> gs.groupBy(identity).map { case (g, o) => g -> o.length.toLong }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (g, o) => g -> o.size.toLong }
    val wt = df.collect { case (g, f) if f * 4 <= n => g -> (n * 256) / f }
    val dl = grams.map { case (d, gs) => d -> gs.length.toLong } // = |ts|-2
    val s = dl.values.sum
    val m = dl.size.toLong
    val expected = (0L until 10L).flatMap { q =>
      val qtf = tf.getOrElse(q, Map.empty).filter { case (g, _) => wt.contains(g) }
      val scored = tf.toSeq.collect { case (d, dtf) if d != q =>
        val shared = qtf.keySet.intersect(dtf.keySet.filter(wt.contains))
        // the engine's pinned sequence: ((tfq·wt)ᴰ · (22·tf)ᴰ · Sᴰ) / denᴰ,
        // folded over the (tf, tfq, wt)-sorted contribution list with seed 0
        val cs = shared.toSeq.map { g =>
          val t = dtf(g); val tq = qtf(g); val w = wt(g)
          (t, tq, w,
            (tq * w).toDouble * (22 * t).toDouble * s.toDouble /
              (10 * s * t + 3 * s + 9 * dl(d) * m).toDouble)
        }.sortBy(x => (x._1, x._2, x._3))
        (d, cs.foldLeft(0.0)((a, x) => a + x._4), shared.size.toLong)
      }.filter(_._3 >= 1)
      scored.sortBy { case (d, sc, _) => (-sc, d) }.take(5).zipWithIndex.map {
        case ((d, sc, ns), r) => (q, r + 1, d, sc, ns)
      }
    }
    val got = ClusterOps.q137Bm25TopK.fn(spark, small).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(got == expected) // == on the doubles: bit-identical, not approx
  }

  test("q137 saturation and length normalization on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    // 16 docs so the shared query gram (df=4) survives the df*4 <= n
    // stop-phrase cutoff. doc 0 queries; 11 has the gram once in a
    // short doc, 12 twice in the SAME length, 13 once in a long doc.
    val fillers = (20L until 32L).map(i =>
      (i, s"junk$i filler$i word$i more$i", "en", "s1"))
    val docs = Seq(
      (0L, "x y z", "en", "s0"),
      (11L, "x y z p q r", "en", "s1"),
      (12L, "x y z x y z", "en", "s1"),
      (13L, "x y z p q r s t u v w a", "en", "s1")) ++ fillers
    docs.map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rs = ClusterOps.q137Bm25TopK.fn(spark, dir)
      .filter(col("query_id") === 0L)
      .select(col("neighbor_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rs.keySet === Set(11L, 12L, 13L))
    // length normalization: same tf, longer doc scores strictly lower
    assert(rs(11L) > rs(13L), s"longer doc not penalized: $rs")
    // saturation: doubling tf at equal length gains, but less than 2x
    assert(rs(12L) > rs(11L) && rs(12L) < 2.0 * rs(11L),
      s"tf saturation violated: $rs")
  }
}
