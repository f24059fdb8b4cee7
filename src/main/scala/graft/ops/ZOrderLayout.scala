package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Z-ordered (Morton-curve) file layout — multi-dimensional clustering
  * for file-level data skipping, the `OPTIMIZE ZORDER BY` capability of
  * Delta/Iceberg re-expressed as a plain write pattern (cf. the
  * Z-ordering discussion in Delta Lake's OPTIMIZE docs and Morton,
  * "A computer oriented geodetic data base...", IBM 1966).
  *
  * Why a single-column sort is not enough at 100 TB: range-partitioning
  * a table by `x` gives every file a tight x-range but the FULL y-range,
  * so a predicate on y alone can skip nothing — every file's min/max
  * stats straddle it. Sorting by the interleaved-bit Morton code
  * `zorder2(xd, yd)` instead gives each file a BALANCED bounding box
  * (~√n of each dimension's range at n files), so min/max pruning works
  * for selective predicates on x, on y, or both. The trade: per-dim
  * pruning power drops from 1/n (own-sort) to ~1/√n — Z-order is the
  * layout for tables queried along MULTIPLE dimensions, not a strict
  * upgrade.
  *
  * Mechanics: digest each dimension to 16 comparable bits (mod for
  * integer ids, bucketed floor for continuous values — comparable WIDTHS
  * matter: a dimension with far fewer effective bits contributes only
  * zero high bits and the curve degrades toward the other dimension's
  * sort), then `repartitionByRange(n, z)` + `sortWithinPartitions(z)`:
  * one range shuffle at write time, n files, each covering a compact
  * z-interval = compact (x, y) box. ZOrderSpec measures the property
  * against an x-sorted control layout via per-file bounding boxes.
  */
object ZOrderLayout {

  /** `df` with a `z` column appended from two int dimension digests. */
  def withZ(df: DataFrame, xDigest: Column, yDigest: Column): DataFrame =
    df.withColumn("z", GraftFunctions.zorder2(xDigest, yDigest))

  /** Write `df` as `n` z-clustered parquet files under `path`.
    * Dimension digests must already be 16-bit ints (see object doc).
    */
  def writeZOrdered(df: DataFrame, xDigest: Column, yDigest: Column,
      n: Int, path: String): Unit =
    withZ(df, xDigest, yDigest)
      .repartitionByRange(n, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)

  /** Write `df` z-clustered under `path` with EXPLICIT, curve-aligned
    * cuts instead of `repartitionByRange`'s sampled ones.
    *
    * When the digest domain is known (`bitsPerDim` bits per dimension —
    * the common case, since the caller built the digests), sampling buys
    * nothing and costs a full extra pass over the input: RangePartitioner
    * runs a sketch job before the real shuffle, and on skewed inputs its
    * quantile cuts land mid-quadrant, widening seam files' bounding
    * boxes. Cutting the z-domain `[0, 4^bitsPerDim)` into `n` equal
    * intervals instead (with `n` a power of 4, each interval IS a curve
    * quadrant) gives every file an exactly square bounding box, no
    * sampling job, and bit-for-bit deterministic layout — the variant a
    * 100 TB compaction wants. Files land as one directory per z-bucket
    * (`zb=<i>/`), which doubles as a partition-pruning column for readers
    * that carry the z-bucket predicate.
    */
  def writeZOrderedAligned(df: DataFrame, xDigest: Column, yDigest: Column,
      bitsPerDim: Int, n: Int, path: String): Unit = {
    require(n > 0 && (n & (n - 1)) == 0, s"n must be a power of two, got $n")
    val zBits = 2 * bitsPerDim
    require(Integer.numberOfTrailingZeros(n) <= zBits,
      s"n=$n exceeds the $zBits-bit z-domain")
    val width = (1L << zBits) / n
    withZ(df, xDigest, yDigest)
      .withColumn("zb", (col("z") / width).cast("int"))
      .repartition(n, col("zb"))
      .sortWithinPartitions(col("z"))
      .write.partitionBy("zb").mode("overwrite").parquet(path)
  }
}
