package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the claim ShardPacking's scaladoc makes: the two-pass
  * block-decomposed prefix sum is BIT-IDENTICAL to the naive
  * one-window-per-source running sum, at every blockSpan — including
  * blockSpan=1 (every row its own block: the offsets frame IS the
  * corpus, pass 2 degenerates to the seed join) and a blockSpan larger
  * than any order value (one block per source: pass 1 degenerates and
  * pass 2 IS the naive window). Fixture has skewed source sizes, a
  * sparse non-contiguous order column, zero-token rows, and a doc
  * whose count exceeds the budget (spans multiple shards' worth of
  * budget — first-token rule still lands it in exactly one shard).
  */
class ShardPackingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: DataFrame = {
    val rows = Seq(
      // (source, doc_id, n) — "web" large + skewed, ids sparse
      ("web", 1L, 1500L), ("web", 3L, 2500L), ("web", 7L, 100L),
      ("web", 90L, 5000L), ("web", 91L, 0L), ("web", 4000L, 4095L),
      ("web", 4001L, 1L), ("web", 1048577L, 7L),
      ("books", 2L, 4096L), ("books", 5L, 4096L), ("books", 6L, 1L),
      ("code", 10L, 9000L) // single doc bigger than two budgets
    )
    rows.toDF("source", "doc_id", "n")
  }

  /** The naive form the two-pass algorithm must reproduce, in the same
    * pure-integer arithmetic (`div`, not `/`-then-cast).
    */
  private def oneWindowFull(df: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__ps", sum(col("n").cast("long")).over(w))
      .withColumn("shard_id", expr(s"(__ps - n) div ${budget}L").cast("bigint"))
      .drop("__ps")
  }

  private def sortedRows(df: DataFrame): Seq[(String, Long, Long)] =
    df.select(col("source"), col("doc_id"), col("shard_id"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("bit-identical to the one-window form at several blockSpans") {
    val budget = 4096L
    val expected = sortedRows(oneWindowFull(fixture, budget))
    for (span <- Seq(1L, 2L, 7L, 64L, 1L << 20, Long.MaxValue / 4)) {
      val got = sortedRows(
        ShardPacking.assignShards(fixture, "source", "doc_id", "n", budget, span))
      assert(got == expected, s"blockSpan=$span diverged from one-window form")
    }
  }

  test("budget=1 degenerate: every nonzero-token doc opens its own shard") {
    val got = sortedRows(
      ShardPacking.assignShards(fixture, "source", "doc_id", "n", 1L, 4L))
    val expected = sortedRows(oneWindowFull(fixture, 1L))
    assert(got == expected)
  }

  test("output schema: adds only the shard column, preserves input columns") {
    val out = ShardPacking.assignShards(fixture, "source", "doc_id", "n", 4096L)
    assert(out.columns.toSeq == Seq("source", "doc_id", "n", "shard_id"))
    val named = ShardPacking.assignShards(
      fixture, "source", "doc_id", "n", 4096L, shardCol = "sid")
    assert(named.columns.contains("sid"))
  }

  test("reserved temp-column collision is rejected up front") {
    val bad = fixture.withColumn("__blk", lit(0L))
    val e = intercept[IllegalArgumentException] {
      ShardPacking.assignShards(bad, "source", "doc_id", "n", 4096L)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("null key fails fast instead of silently dropping the row") {
    val withNull = fixture.unionByName(
      Seq((null.asInstanceOf[String], 999L, 5L)).toDF("source", "doc_id", "n"))
    val e = intercept[Exception] {
      ShardPacking.assignShards(withNull, "source", "doc_id", "n", 4096L)
        .count()
    }
    assert(e.getMessage.toLowerCase.contains("non-null contract") ||
      Option(e.getCause).exists(_.getMessage.contains("non-null contract")))
  }

  test("no single-task-per-source window in the plan at small blockSpan") {
    // The whole point: the only unbounded-per-source window runs over
    // BLOCK AGGREGATES. With blockSpan=2 the in-block window frames are
    // bounded; assert the physical plan partitions windows by (source,
    // __blk), i.e. some window node carries the block key.
    val out = ShardPacking.assignShards(fixture, "source", "doc_id", "n", 4096L, 2L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__blk"), "expected block-keyed window in plan")
  }

  test("withPrefixSum: exclusive running sum equals the one-window form at several blockSpans") {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = fixture
      .withColumn("pre", coalesce(sum(col("n").cast("long")).over(w), lit(0L)))
      .orderBy(col("source"), col("doc_id"))
      .collect().toSeq
    for (span <- Seq(1L, 2L, 64L, 1L << 20)) {
      val got = ShardPacking
        .withPrefixSum(fixture, "source", "doc_id", "n", "pre", span)
        .orderBy(col("source"), col("doc_id"))
        .collect().toSeq
      assert(got == naive, s"blockSpan=$span")
    }
  }
}
