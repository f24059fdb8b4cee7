package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q145/q146 — the trained quality classifier's fixed-point GD.
  *
  * The DuckDB oracle replays the same unrolled arithmetic, so these
  * specs pin what the oracle CANNOT: (1) the distributed step against
  * an INDEPENDENT sequential BigInt reference (a shared algebra bug in
  * both SQL renderings would slip an oracle compare), (2) partition
  * invariance — the bit-reproducibility claim is about ANY partitioning,
  * and the oracle only ever sees one, (3) the hard-sigmoid clamp edges,
  * (4) a non-degeneracy guard on the real corpus (a trainer that never
  * moves a weight would still "match" a broken oracle of itself).
  */
class QualityTrainSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val Qs = CurationOps.gdQ // 65536 — probability/label scale
  private val Fs = CurationOps.gdF // 256 — feature scale

  /** One GD step in plain sequential BigInt arithmetic — mirrors the
    * documented math, not the Spark code: p = clamp((z+2Q)/4, 0, Q),
    * g_j = Σ (p − Q·y)·x_j, w_j ← w_j − ((g_j + F·nQ)/(nQ) − F).
    * BigInt `/` truncates toward zero, which equals floor on the
    * non-negative update numerator and is clamp-equivalent inside the
    * link (the same argument the scaladoc makes for the engines). */
  private def refStep(rows: Seq[(Long, Seq[Long])],
      w: Seq[BigInt]): Seq[BigInt] = {
    val n = BigInt(rows.size)
    val den = n * Qs
    val K = BigInt(Fs)
    val g = Array.fill(5)(BigInt(0))
    for ((y, x) <- rows) {
      val z = (0 until 5).map(j => w(j) * x(j)).sum
      val p = ((z + 2 * Qs) / 4).max(0).min(Qs)
      val e = p - BigInt(Qs) * y
      for (j <- 0 until 5) g(j) += e * x(j)
    }
    (0 until 5).map(j => w(j) - ((g(j) + K * den) / den - K))
  }

  private def fixture: DataFrame = Seq(
    // (doc_id, y, x0..x4) — mixed labels, saturating and interior
    // feature values in [0, F]; step magnitudes chosen so z crosses
    // the link's interior over the three reference rounds
    (1L, 1L, Fs, 200L, 0L, 10L, Fs),
    (2L, 1L, Fs, 120L, 5L, 0L, 117L),
    (3L, 0L, Fs, 0L, 256L, 256L, 1L),
    (4L, 0L, Fs, 1L, 234L, 117L, Fs),
    (5L, 1L, Fs, 256L, 0L, 0L, 0L),
    (6L, 0L, Fs, 48L, 91L, 135L, 178L),
    (7L, 0L, Fs, 1L, 2L, 3L, 4L)
  ).toDF("doc_id", "y", "x0", "x1", "x2", "x3", "x4")

  private def weightsOf(w: DataFrame): Seq[BigInt] =
    w.collect().head match {
      case r => (0 until 5).map(j => BigInt(r.getLong(j)))
    }

  test("gdStep over 3 rounds equals the sequential BigInt reference") {
    val rows = fixture.collect().toSeq
      .map(r => (r.getLong(1), (2 to 6).map(r.getLong)))
    val fx = fixture
    val w0df = spark.range(1).select(
      lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"),
      lit(0L).as("w3"), lit(0L).as("w4"))
    var wDf = w0df
    var wRef: Seq[BigInt] = Seq.fill(5)(BigInt(0))
    for (r <- 1 to 3) {
      wDf = CurationOps.gdStep(fx, wDf).localCheckpoint()
      wRef = refStep(rows, wRef)
      assert(weightsOf(wDf) === wRef, s"round $r diverged from reference")
    }
    // the fixture is chosen so training actually moves: at least one
    // weight is nonzero after round 1
    assert(wRef.exists(_ != 0))
  }

  test("learned weights are bit-identical under any partitioning") {
    val fx = CurationOps.gdTrainFrame(spark, sf)
    def train(f: DataFrame): Seq[Seq[BigInt]] = {
      var w = spark.range(1).select(
        lit(0L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"),
        lit(0L).as("w3"), lit(0L).as("w4"))
      (1 to 3).map { _ =>
        w = CurationOps.gdStep(f, w).localCheckpoint(); weightsOf(w)
      }
    }
    assert(train(fx.repartition(1)) === train(fx.repartition(13)))
  }

  test("hard-sigmoid link: exact values at the clamp edges and interior") {
    val zs = Seq(-2L * Qs - 7, -2L * Qs, -3L, -1L, 0L, 2L,
      2L * Qs - 1, 2L * Qs, 2L * Qs + 9)
    val got = zs.toDF("z")
      .select(expr(s"least(greatest((z + ${2 * Qs}) div 4, 0L), $Qs)"))
      .collect().map(_.getLong(0)).toSeq
    val want = zs.map(z => ((z + 2 * Qs) / 4).max(0L).min(Qs))
    assert(got === want)
  }

  test("q145 trains a non-degenerate model and q146 applies its fixpoint") {
    val tr = CurationOps.q145QualityTrain.fn(spark, sf).collect()
    assert(tr.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // non-degeneracy: the trainer moved at least one non-bias weight
    assert(tr.exists(r => (2 to 5).exists(j => r.getLong(j) != 0L)))
    val w3 = tr.last
    val applied = CurationOps.q146QualityApply.fn(spark, sf)
    // spot-check the apply arithmetic against the trained row: recompute
    // z for every doc from the design matrix and the round-3 weights
    val fx = CurationOps.gdTrainFrame(spark, sf).collect()
      .map(r => r.getLong(0) -> (2 to 6).map(r.getLong)).toMap
    val w = (1 to 5).map(w3.getLong)
    for (r <- applied.collect().take(50)) {
      val x = fx(r.getLong(0))
      val z = (0 until 5).map(j => w(j) * x(j)).sum
      assert(r.getLong(2) === z)
      val p = ((z + 2 * Qs) / 4).max(0L).min(Qs)
      assert(r.getLong(3) === p)
      assert(r.getInt(4) === (if (p >= Qs / 2) 1 else 0))
    }
  }
}
