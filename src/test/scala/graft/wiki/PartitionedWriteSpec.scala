package graft.wiki

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hive-style partitioned writes + DYNAMIC partition overwrite — the
  * incremental-reprocess contract a 100 TB pipeline depends on: re-running
  * one day's job must replace exactly that day's partition directories and
  * leave every other partition untouched (static overwrite mode would
  * truncate the whole table — the classic data-loss foot-gun this spec
  * pins against).
  */
class PartitionedWriteSpec extends SparkSpec {

  test("dynamic partition overwrite replaces only the partitions present in the batch") {
    val s = spark
    import s.implicits._
    val p = java.nio.file.Files.createTempDirectory("dynpart").toString + "/t"
    Seq(("2024-03-01", 1L, "a"), ("2024-03-01", 2L, "b"),
      ("2024-03-02", 3L, "c"), ("2024-03-03", 4L, "d"))
      .toDF("d", "id", "v")
      .write.partitionBy("d").parquet(p)

    // re-process day 2 only: two corrected rows
    Seq(("2024-03-02", 30L, "c2"), ("2024-03-02", 31L, "c3"))
      .toDF("d", "id", "v")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("d").parquet(p)

    val back = spark.read.parquet(p)
      .select(col("d").cast("string"), col("id"), col("v"))
      .as[(String, Long, String)].collect().toSet
    assert(back === Set(
      ("2024-03-01", 1L, "a"), ("2024-03-01", 2L, "b"),   // untouched
      ("2024-03-02", 30L, "c2"), ("2024-03-02", 31L, "c3"), // replaced
      ("2024-03-03", 4L, "d")))                            // untouched
  }

  test("partition pruning reads only the filtered day's directory") {
    val s = spark
    import s.implicits._
    val p = java.nio.file.Files.createTempDirectory("prune").toString + "/t"
    (1 to 100).map(i => (s"2024-03-${"%02d".format(i % 4 + 1)}", i.toLong))
      .toDF("d", "id").write.partitionBy("d").parquet(p)
    val q = spark.read.parquet(p).filter(col("d") === "2024-03-02")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-03-02"),
      s"expected a partition filter on the scan:\n$scan")
    assert(q.count() === 25)
  }
}
