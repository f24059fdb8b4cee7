package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting — the manual fallback for
  * the hot-key case AQE's skew-join split doesn't cover (AQE splits
  * oversized SHUFFLE partitions of sort-merge joins, but a single
  * pathological key inside one task, or a broadcast-ineligible dim with
  * a hot key, still serializes onto one core at 100 TB).
  *
  * Shape: the FACT side gets a deterministic per-row salt in
  * [0, saltFactor); the DIM side is exploded saltFactor× (one copy per
  * salt); the join key becomes (key, salt), spreading each hot key's
  * rows over saltFactor tasks. Cost: dim inflates saltFactor× (dims are
  * small — that's why they're the replicated side) and the fact side
  * adds one narrow projection. Result equality with the plain join is
  * exact — every fact row still meets exactly one dim copy.
  *
  * The salt is hash-derived from the whole fact row's key ROW identity
  * column (caller-chosen, e.g. a unique id), not rand(): deterministic
  * across retries, so speculative/re-executed tasks produce identical
  * output — rand() salting breaks exactly-once semantics under retry.
  */
object SkewJoin {

  /** Inner equi-join of `fact` and `dim` on `key`, salted to
    * `saltFactor` subtasks per key. `factId` must be any deterministic
    * per-row column of `fact` (uniqueness not required — only
    * distribution). Output columns follow Spark's usual join projection:
    * fact columns then dim columns (minus the duplicated key).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factId: Column, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = fact.withColumn("__salt", pmod(xxhash64(factId), lit(saltFactor)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
