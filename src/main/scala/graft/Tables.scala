package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated star-schema parquet tables
  * (TESTDATA.md). One function per table; every query builder takes the
  * scale-factor directory so the same plan runs at any SF.
  *
  * All loads are plain parquet scans so Catalyst gets predicate pushdown
  * and column pruning for free — filters/projections applied by the
  * query builders reach the scan (`PushedFilters` / `ReadSchema` in
  * `.explain("formatted")`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is nanosecond-precision in parquet, which Spark 4 only
    * reads with `spark.sql.legacy.parquet.nanosAsLong=true` (set by the
    * Verify/Bench/test session builders). Under that flag the column
    * arrives as LongType nanos; normalize it to a microsecond TIMESTAMP
    * (integer `div`, not `/`, because nanos exceed 2^53 and a double
    * round-trip would corrupt them). DuckDB's oracle reads the same file
    * truncated to µs as well, so both engines agree (TESTDATA caveat,
    * FIXTURES.md §B).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `documents` hash-distributed across the cluster BEFORE expensive
    * per-row work. The testdata parquet is a SINGLE ROW GROUP, and a row
    * group is Spark's minimum split unit — so every map-side stage over
    * `documents` (shingling, hashing, tokenizing) otherwise runs in ONE
    * task regardless of core count. One cheap shuffle of the raw text
    * (~2 MB at sf0.1) buys full parallelism for the CPU-heavy
    * projections above it. On a real 100 TB corpus the input arrives as
    * thousands of row groups and the scan parallelizes natively — this
    * helper is the single-file-harness compensation, keyed on doc_id so
    * the distribution is deterministic, not round-robin.
    *
    * The partition count is EXPLICIT: a bare `repartition(col)` is an
    * AQE-optimizable shuffle (REPARTITION_BY_COL), and with these small
    * byte sizes AQE happily coalesces it back to ONE partition —
    * re-serializing exactly the stage this helper exists to spread (and
    * doing so nondeterministically, since the decision depends on
    * cached-vs-not runtime stats). An explicit count is a
    * REPARTITION_BY_NUM shuffle, which AQE must respect.
    */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir).repartition(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      org.apache.spark.sql.functions.col("doc_id"))

  /** `orders` under the same single-row-group compensation as
    * [[documentsSpread]] (same rationale, same explicit-count rule):
    * the column-profile family (q75/q97) runs per-value hashing and a
    * 4-way Expand over every order row, which otherwise executes in
    * ONE task — round 12 measured both queries >75% single-task
    * (q75: 5 tasks, 2.6 s task time, 2.57 s wall). */
  def ordersSpread(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir).repartition(
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      org.apache.spark.sql.functions.col("o_orderkey"))
}
