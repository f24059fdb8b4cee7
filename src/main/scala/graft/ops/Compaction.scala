package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Output-file sizing — the writer-side half of the small-files problem
  * (the `OPTIMIZE`/compaction capability of Delta/Iceberg re-expressed
  * as plain Spark write patterns).
  *
  * Why this is a first-class 100 TB concern: a 1000-executor job whose
  * last stage has 32k tasks writes 32k files per partition directory;
  * downstream scans then pay one namenode round-trip and one footer
  * read per file, and the scheduler pays per-split overhead — at some
  * point listing the table costs more than reading it. The inverse
  * failure (one 40 GB file from a `coalesce(1)`) serializes every
  * downstream scan into one task. Both are LAYOUT bugs invisible to
  * row-level correctness; the fix is sizing output files to a target
  * (128–1024 MB for parquet at scale; small values here only for
  * testability).
  *
  * Two complementary paths:
  *
  *  - [[compact]] — post-hoc: size an EXISTING directory by its real
  *    on-disk bytes (exact, codec-aware, no estimation) and rewrite it
  *    as `ceil(bytes/target)` round-robin-balanced files. This is the
  *    nightly "compact yesterday's ingest" job. Round-robin
  *    (`repartition(n)`) rather than range: compaction has no query
  *    dimension to cluster by — balanced sizes are the whole point —
  *    and Spark sorts partitions before round-robin distribution, so
  *    the rewrite is deterministic. When the data DOES have a query
  *    dimension, compact through [[ZOrderLayout.writeZOrdered]] instead
  *    (same file-count math, clustered layout).
  *
  *  - [[writeRebalanced]] — in-query: the AQE `REBALANCE` hint
  *    (SPARK-35725, Spark's own answer to write sizing) lets the final
  *    exchange split skewed partitions AND coalesce small ones toward
  *    `spark.sql.adaptive.advisoryPartitionSizeInBytes`. Caveat the
  *    scaladoc pins: AQE sizes by EXCHANGE bytes (row-format,
  *    pre-compression), so on-disk parquet files come out smaller than
  *    the advisory by roughly the compression ratio (3–10× for text);
  *    set the advisory to `target × ratio` with the ratio measured
  *    from a prior [[compact]] run or a written sample.
  *
  * CompactionSpec pins: file counts scale inversely with the target,
  * sizes land within 2× of it on both sides, content round-trips
  * exactly, and the REBALANCE path responds to the advisory size.
  */
object Compaction {

  /** Total on-disk bytes of the data files directly under `dir`
    * (skips `_SUCCESS`, `.crc` sidecars, and other metadata).
    */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getLen).sum
  }

  /** `ceil(totalBytes / targetBytes)`, at least 1 — the file count that
    * puts every file AT OR UNDER the target (never round-to-nearest:
    * rounding 1.4× down would produce files 40% OVER target, and
    * oversized files serialize downstream tasks, the worse failure).
    */
  def targetFileCount(totalBytes: Long, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
  }

  /** Rewrite the parquet directory `inDir` to `outDir` as files of
    * ~`targetBytes` each (exact byte accounting from the source files;
    * the per-file result varies only by encoding drift from re-mixing
    * rows). Returns the file count written. One round-robin shuffle.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    val total = dataBytes(spark, inDir)
    // A partitionBy layout has its data files one level down: dataBytes
    // would report 0, targetFileCount(0) = 1, and the rewrite would
    // funnel the whole (recursively-read) table through one task — the
    // exact failure the object doc warns against, silently. Partitioned
    // tables must be compacted per leaf directory (which also preserves
    // the partition layout the flat rewrite would destroy).
    val p = new Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasSubdirs = fs.listStatus(p)
      .exists(s => s.isDirectory && !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_")) // _spark_metadata etc. is metadata, not layout
    require(total > 0 || !hasSubdirs,
      s"$inDir holds its data in subdirectories (partitionBy layout) — " +
        "compact each leaf partition directory individually")
    require(total > 0, s"no data files found under $inDir")
    val n = targetFileCount(total, targetBytes)
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Write `df` with the AQE REBALANCE hint: the final exchange is
    * split/coalesced toward `spark.sql.adaptive.advisoryPartitionSizeInBytes`
    * at runtime. See the object doc for the exchange-bytes-vs-disk-bytes
    * calibration caveat.
    */
  def writeRebalanced(df: DataFrame, outDir: String): Unit =
    df.hint("rebalance")
      .write.mode("overwrite").parquet(outDir)
}
