package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end contracts for the composed curation pipeline: funnel
  * monotonicity, stage post-conditions on the actual written shards
  * (quality floor, decontamination, shard token bounds), and
  * bit-reproducibility of the full run.
  */
class CurateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val outA = {
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_a").toString
    (dir, Curate.run(spark, sf, dir))
  }

  test("the funnel only ever shrinks, and every stage count is populated") {
    val (_, r) = outA
    val funnel = Seq(r.nInput, r.nQuality, r.nExactDedup, r.nNearDedup,
      r.nDecontaminated, r.nSampled)
    assert(funnel === funnel.sorted.reverse, s"funnel grew somewhere: $r")
    assert(r.nInput > 0 && r.nSampled > 0 && r.nShards > 0 && r.nTokens > 0, r.toString)
  }

  test("every written doc passes the quality floor and is uncontaminated") {
    val (dir, _) = outA
    val written = spark.read.parquet(s"$dir/shards")
    val ids = written.select(col("doc_id")).collect().map(_.getLong(0)).toSet

    val passing = graft.queries.CurationOps.qualityScored(spark, sf)
      .filter(col("score") >= 0.05).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(passing), "a written doc failed the quality gate")

    // recompute contamination independently (interpreted HOF formulation,
    // not the pipeline's native ngrams): shared 5-gram with docs 0-9
    val probe = graft.Tables.documents(spark, sf).where("doc_id < 10")
      .selectExpr("explode(array_distinct(transform(sequence(1, size(filter(split(lower(text), ' '), t -> t <> '')) - 4), " +
        "i -> concat_ws(' ', slice(filter(split(lower(text), ' '), t -> t <> ''), i, 5))))) g")
      .distinct().collect().map(_.getString(0)).toSet
    val contaminated = graft.Tables.documents(spark, sf).where("doc_id >= 10")
      .selectExpr("doc_id", "array_distinct(transform(sequence(1, size(filter(split(lower(text), ' '), t -> t <> '')) - 4), " +
        "i -> concat_ws(' ', slice(filter(split(lower(text), ' '), t -> t <> ''), i, 5)))) gs")
      .where("size(filter(split(lower(text), ' '), t -> t <> '')) >= 5")
      .collect().filter(r => r.getSeq[String](1).exists(probe.contains)).map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty, "a contaminated doc was written")
    assert(ids.forall(_ >= 10), "an eval doc leaked into the corpus")
  }

  test("every shard respects the token budget up to one straddling doc") {
    val (dir, _) = outA
    val shards = spark.read.parquet(s"$dir/shards")
      .groupBy(col("source"), col("shard_id"))
      .agg(sum(col("n_tok")).cast("long").as("tok"),
        max(col("n_tok")).cast("long").as("mx"))
      .collect()
    shards.foreach { r =>
      assert(r.getLong(2) - r.getLong(3) < 4096L,
        s"shard ${r.get(0)}/${r.get(1)} exceeds budget beyond its straddler: $r")
    }
  }

  test("the pipeline is bit-reproducible: a second run writes identical shard assignments") {
    val (dirA, _) = outA
    val dirB = java.nio.file.Files.createTempDirectory("graft_curate_b").toString
    Curate.run(spark, sf, dirB)
    def snapshot(d: String) = spark.read.parquet(s"$d/shards")
      .select(col("source"), col("shard_id").cast("long"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(snapshot(dirA) === snapshot(dirB))
  }

  test("shard partitioning prunes: a (source, shard_id) read lists one directory") {
    val (dir, _) = outA
    val one = spark.read.parquet(s"$dir/shards")
      .select(col("source"), col("shard_id").cast("long")).distinct().collect().head
    val pruned = spark.read.parquet(s"$dir/shards")
      .filter(col("source") === one.getString(0) && col("shard_id") === one.getLong(1))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(scan.contains("PartitionFilters"), scan)
  }
}
