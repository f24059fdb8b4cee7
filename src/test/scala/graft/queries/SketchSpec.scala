package graft.queries

import graft.SparkSpec

/** Statistical-contract tests for the sketch ops — properties the oracle
  * hash-compare can't express (it proves both engines compute the same
  * numbers; these prove the numbers MEAN something).
  */
class SketchSpec extends SparkSpec {

  test("q63 KMV estimate lands within the k=64 error envelope of the exact count") {
    val rows = PipelineOps.q63KmvDistinct.fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("n_exact")).toDouble
      val est = r.getDouble(r.fieldIndex("kmv_estimate"))
      // rsd of KMV at k=64 is ~1/sqrt(k-2) ≈ 12.7%; 35% is a ~2.75σ
      // bound — and the data is fixed, so this is a deterministic check
      // that the estimator formula is wired correctly, not a flaky
      // statistical assertion
      assert(math.abs(est / exact - 1.0) < 0.35,
        s"source=${r.getString(0)}: exact=$exact est=$est")
    }
  }

  test("q63 KMV degenerates to the exact count when a group has fewer than k hashes") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 10 distinct tokens < k=64 → the sketch holds the whole set
    val tiny = (1 to 10).map(i => (s"tok$i", "only")).toDF("t", "source")
    val hashed = tiny.select(col("source"),
      expr("cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)").as("h")).distinct()
    assert(hashed.count() === 10) // no collisions at this scale
    // the query's CASE arm: n_hashes < k → estimate = n_hashes exactly
    val est = hashed.groupBy("source").count().collect()(0).getLong(1).toDouble
    assert(est === 10.0)
  }
}
