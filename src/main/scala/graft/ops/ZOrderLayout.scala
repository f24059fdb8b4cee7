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
}
