package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The q131/q132 exactness discipline, pinned at the DECODER-CONTRACT
  * ceilings rather than at corpus values: energy bands are
  * sum-of-squares whose centered values would break double exactness
  * in the cosine if fed raw (video c² ≈ 4·10¹⁶ > 2^53), so
  * `scaledCenteredFp` integer-divides each band first (÷256 video,
  * ÷65536 audio). These tests prove the chosen divisors are SUFFICIENT
  * at the theoretical maxima — a future payload growth (more frames,
  * wider rasters, hotter samples) that invalidates the bound fails
  * here, not as a silent cross-engine hash divergence.
  */
class NearDupExactnessSpec extends SparkSpec {

  private val twoTo53 = 1L << 53

  /** Driver-side mirror of scaledCenteredFp's arithmetic. */
  private def centered(bands: Seq[Long], div: Long): Seq[Long] = {
    val b = bands.map(_ / div)
    val tot = b.sum
    b.map(x => 16L * x - tot)
  }

  /** Adversarial band shapes at a per-band ceiling: all-max, one-hot,
    * alternating — the extremes of tot-vs-band imbalance, which is
    * what maximizes |16·b − tot|. */
  private def shapes(bandMax: Long): Seq[Seq[Long]] = Seq(
    Seq.fill(16)(bandMax),
    bandMax +: Seq.fill(15)(0L),
    (0 until 16).map(i => if (i % 2 == 0) bandMax else 0L))

  private def assertExactAtCeiling(bandMax: Long, div: Long, tag: String): Unit =
    for (a <- shapes(bandMax); b <- shapes(bandMax)) {
      val ca = centered(a, div)
      val cb = centered(b, div)
      // sufficient condition for the whole double fold to be exact:
      // every centered value AND the sum of |products| (which bounds
      // every partial sum regardless of sign cancellation) < 2^53
      (ca ++ cb).foreach(c => assert(math.abs(c) < twoTo53,
        s"$tag: centered value $c not exactly representable"))
      val absSum = ca.zip(cb)
        .map { case (x, y) => (BigInt(x) * BigInt(y)).abs }.sum
      assert(absSum < BigInt(twoTo53),
        s"$tag: |product| sum $absSum exceeds 2^53 — divisor $div too small")
      // and the double fold indeed equals exact integer arithmetic
      val dotBig = ca.zip(cb).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val dotD = ca.zip(cb).foldLeft(0.0) { case (s, (x, y)) =>
        s + x.toDouble * y.toDouble
      }
      assert(BigDecimal.exact(dotD) == BigDecimal(dotBig),
        s"$tag: double fold $dotD != exact $dotBig")
    }

  test("video divisor (256) keeps the centered dot exact at the DIB ceiling") {
    // per band: 192 pixels (4 frames x 48 bytes/row) of byte² ≤ 255²
    assertExactAtCeiling(192L * 255 * 255, 256L, "video")
  }

  test("audio divisor (65536) keeps the centered dot exact at the G.711 ceiling") {
    // per band: 48 samples of pcm² ≤ 32124² (the μ-law expansion's max)
    assertExactAtCeiling(48L * 32124 * 32124, 65536L, "audio")
  }

  test("a raw (undivided) video band ceiling would NOT be exact — the scaling is load-bearing") {
    // one-hot, not all-max: uniform bands center to zero (16·b == tot)
    val ca = centered(shapes(192L * 255 * 255)(1), 1L)
    val absSum = ca.zip(ca).map { case (x, y) => (BigInt(x) * BigInt(y)).abs }.sum
    assert(absSum >= BigInt(twoTo53),
      "the unscaled ceiling fits 2^53 — the divisor (and this spec) can be dropped")
  }

  test("the Spark plan's scaled fingerprint matches the driver-side mirror on planted extremes") {
    import spark.implicits._
    val vMax = 192L * 255 * 255
    val planted = Seq(
      (1L, Seq.fill(16)(vMax)),
      (2L, vMax +: Seq.fill(15)(0L)),
      (3L, (0 until 16).map(i => if (i % 2 == 0) vMax else 0L).toSeq),
      (4L, Seq.fill(16)(0L))) // zero-norm: must be dropped
      .toDF("doc_id", "bands")
    // parquet round-trip so the expressions run against a real scan,
    // not a constant-folded LocalTableScan (the SKILL.md caveat)
    val dir = java.nio.file.Files.createTempDirectory("graft_ndx").toString
    planted.write.mode("overwrite").parquet(dir)
    val got = PipelineOps
      .scaledCenteredFp(spark.read.parquet(dir), 256L, nDocs = 4L)
      .select(col("doc_id"), col("c"), col("nrm"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](1).toVector, r.getDouble(2))).sortBy(_._1)
    // docs 1 (uniform: 16·b == tot centers to zero) and 4 (all-zero)
    // are both zero-norm and must be dropped
    assert(got.map(_._1).toSeq === Seq(2L, 3L), "zero-norm rows survived")
    got.foreach { case (id, c, nrm) =>
      val mirror = centered(planted.collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1))
        .toMap.apply(id), 256L)
      assert(c === mirror.map(_.toDouble).toVector, s"doc $id centered diverged")
      // Σc² is exactly representable (the bound above), so nrm must be
      // bit-equal to the driver-side sqrt of the exact integer sum
      val n2 = mirror.map(x => BigInt(x) * BigInt(x)).sum
      assert(nrm === math.sqrt(n2.toDouble), s"doc $id nrm diverged")
    }
  }
}
