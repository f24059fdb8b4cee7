package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout — the storage-level answer to repeated
  * large-to-large joins/aggregations on a stable key (SURVEY.md §7's
  * "co-locate joins via bucketing"; cf. the Spark SQL bucketing design in
  * SPARK-19256).
  *
  * `bucketBy(n, key)` + `sortBy(key)` writes each output file as one of
  * `n` hash buckets of the key, with rows sorted inside the bucket. A
  * later join or groupBy on that key between two tables bucketed the SAME
  * way needs NO Exchange: Catalyst proves the children's
  * `HashPartitioning(key, n)` output partitioning satisfies the join's
  * distribution requirement and stitches bucket i of A to bucket i of B
  * directly (BucketingSpec pins the exchange-free plan). A per-task
  * LOCAL sort remains — since SPARK-28595 the scan does not expose
  * write-time in-bucket ordering to the planner — but it runs over the
  * already-sorted bucket file (near-linear) and moves no data.
  *
  * At 100 TB this converts every recurring fact-to-fact join on the
  * bucket key from a full-cluster shuffle (the single most expensive
  * operation in the job) into a metadata decision made at write time —
  * the classic amortization: pay one shuffle when the table is laid
  * down, never again across the query fleet. Bucket count guidance:
  * total_size / n ≈ 100-200 MB per bucket file per partition, and keep n
  * IDENTICAL across tables meant to join (mismatched counts fall back to
  * shuffling the smaller side).
  *
  * The reference has no analogue (its MySQL tables lean on B-tree
  * indexes; categorizer.py:82-87) — this is Spark-native physical design.
  */
object Bucketing {

  /** Lay a frame down as a bucketed, in-bucket-sorted managed table.
    *
    * The pre-write `repartition(buckets, key)` uses the SAME hash family
    * as the bucket function, so each writer task owns exactly one bucket
    * and each bucket is exactly ONE file — without it every writer task
    * emits a sliver file for every bucket it sees (task × bucket file
    * explosion, the classic bucketed-write small-files trap).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * which is what makes the exchange elimination provable).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
