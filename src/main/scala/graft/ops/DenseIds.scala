package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe dense surrogate-key minting: global `row_number() OVER
  * (ORDER BY key)` semantics without the global window's
  * single-partition sort (the MySQL AUTO_INCREMENT stand-in the
  * Categorize pipeline needs, reference categorizer.py:48-68 — ids
  * dense, deterministic, ordered by the natural key).
  *
  * Two passes, the zipWithIndex decomposition in pure DataFrame form:
  *
  *   1. `repartitionByRange(p, key)` splits the key space into p
  *      ordered ranges (explicit p, so AQE cannot coalesce it back to
  *      one partition); per-range row counts are a tiny p-row frame,
  *      and an exclusive running sum over it (a window over p rows,
  *      not the corpus) yields each range's global offset;
  *   2. `row_number()` within each range, keyed by the range id, plus
  *      the broadcast offset — every window task handles one range,
  *      so parallelism is p regardless of corpus size.
  *
  * Ids are invariant to WHERE the range boundaries fall (any
  * order-preserving split yields the same global numbering), so the
  * only determinism requirement is that the two plan branches reading
  * the ranged frame see the SAME boundaries. That must NOT be left to
  * exchange reuse: if the planner instantiates the range shuffle twice
  * (reuse disabled, or any rule that breaks subtree identity), each
  * instance re-samples with a different RDD-derived seed and boundary
  * keys can land in different ranges per branch — duplicate ids in one
  * range, a gap in another, silently. The ranged frame is therefore
  * eagerly `localCheckpoint`ed: one materialization fixes the
  * boundaries physically and both branches read the same stored
  * blocks. The cost is storing the keyed frame once in the block
  * manager — in this engine the minting inputs are dimension-sized
  * (pages/categories deltas), not corpus-sized.
  *
  * `key` values must be non-null (enforced — a plan-level
  * `assert_true` woven into the key column fails the job on a null
  * key) and unique (the caller dedupes — `dropDuplicates`/`distinct`
  * upstream); ties would make row_number nondeterministic. DenseIdsSpec
  * pins equality with the global-window form across partition counts,
  * offsets, and the empty frame, plus the null fail-fast.
  */
object DenseIds {

  /** The pre-checkpoint ranged frame — factored out so DenseIdsSpec
    * can pin the range-exchange plan shape (the checkpoint hides it
    * from [[assign]]'s visible plan).
    *
    * The non-null half of the key contract is ENFORCED here, not
    * assumed (ShardPacking's fail-fast pattern): the assert is woven
    * into the key column itself, so a null key fails the job at the
    * checkpoint materialization instead of being range-partitioned
    * first and silently minted an id. Uniqueness stays a documented
    * caller obligation (callers dedupe upstream; detecting ties would
    * cost a corpus-sized count the valid path doesn't need).
    */
  private[graft] def rangedFrame(df: DataFrame, key: String, p: Int): DataFrame =
    df.withColumn(key,
        when(assert_true(col(key).isNotNull,
          lit(s"DenseIds: null `$key` violates the non-null key contract"))
          .isNull,
          col(key)))
      .repartitionByRange(p, col(key))
      .withColumn("__pid", spark_partition_id())

  def assign(
      df: DataFrame,
      key: String,
      idCol: String = "id",
      offset: Long = 0L,
      partitions: Int = 0): DataFrame = {
    val reserved = Seq("__pid", "__cnt", "__off")
    require(!df.columns.exists(reserved.contains),
      s"input must not contain reserved temp columns ${reserved.mkString(", ")}")
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt

    val ranged = rangedFrame(df, key, p)
      .localCheckpoint() // pin the sampled range boundaries (object doc)

    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__off"))

    val wIn = Window.partitionBy(col("__pid")).orderBy(col(key))
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(idCol,
        row_number().over(wIn).cast("long") + col("__off") + lit(offset))
      .drop("__pid", "__off")
  }
}
