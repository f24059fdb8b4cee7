package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end contracts for the composed curation pipeline: funnel
  * monotonicity, stage post-conditions on the actual written shards
  * (quality floor, decontamination, chunk coverage law, shard token
  * bounds), and bit-reproducibility of the full run.
  */
class CurateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val budget = 4096L
  private val window = 64
  private val stride = 48

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
    // chunking fans out, never filters: >= one chunk per non-empty doc
    assert(r.nChunks >= r.nSampled, s"chunking lost documents: $r")
  }

  test("every written doc passes the quality floor and is uncontaminated") {
    val (dir, _) = outA
    val written = spark.read.parquet(s"$dir/shards")
    val ids = written.select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet

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

  test("chunk coverage law: every written doc's chunks form exactly q100's stride grid") {
    val (dir, _) = outA
    // independent recount of each written doc's tokens (interpreted HOF
    // form, not the pipeline's expression)
    val nByDoc = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "size(filter(split(lower(text), ' '), t -> t <> '')) n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = spark.read.parquet(s"$dir/shards")
      .select(col("doc_id"), col("chunk_start"), col("nc"), col("chunk_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    chunks.groupBy(_._1).foreach { case (docId, rows) =>
      val n = nByDoc(docId)
      val starts = rows.map(_._2).sorted.toSeq
      assert(starts === (0 until n by stride).map(_.toLong),
        s"doc $docId: chunk grid diverged from sequence(0, ${n - 1}, $stride)")
      rows.foreach { case (_, start, nc, text) =>
        assert(nc === math.min(window.toLong, n - start),
          s"doc $docId chunk $start: clip law violated")
        // the chunk text really holds nc tokens (slice ≡ count)
        assert(text.split(" ").count(_.nonEmpty) === nc,
          s"doc $docId chunk $start: chunk_text token count != nc")
      }
    }
  }

  test("every shard respects the token budget up to one straddling chunk") {
    val (dir, _) = outA
    val shards = spark.read.parquet(s"$dir/shards")
      .groupBy(col("source"), col("shard_id").cast("long").as("shard_id"))
      .agg(sum(col("nc")).cast("long").as("tok"))
      .collect()
    // chunks are <= window tokens, so the exclusive-prefix packing law
    // bounds every shard by budget + (window - 1) — the tight fill
    // ragged-document packing could not guarantee
    shards.foreach { r =>
      assert(r.getLong(2) < budget + window,
        s"shard ${r.get(0)}/${r.get(1)} exceeds budget beyond a chunk straddler: $r")
    }
    // and every shard except possibly each source's last is FULL past
    // the budget line minus one chunk (no pathological underfill)
    val bySource = shards.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      val lastShard = rs.map(_.getLong(1)).max
      rs.filter(_.getLong(1) != lastShard).foreach { r =>
        assert(r.getLong(2) >= budget - window + 1,
          s"non-final shard $src/${r.getLong(1)} underfilled: ${r.getLong(2)}")
      }
    }
  }

  test("the pipeline is bit-reproducible: a second run writes identical shard assignments") {
    val (dirA, _) = outA
    val dirB = java.nio.file.Files.createTempDirectory("graft_curate_b").toString
    Curate.run(spark, sf, dirB)
    def snapshot(d: String) = spark.read.parquet(s"$d/shards")
      .select(col("source"), col("shard_id").cast("long"), col("doc_id"),
        col("chunk_start"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
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

  test("chunk parameters are validated up front") {
    val dir = java.nio.file.Files.createTempDirectory("graft_curate_bad").toString
    intercept[IllegalArgumentException] {
      Curate.run(spark, sf, dir, chunkWindow = 32, chunkStride = 48)
    }
    intercept[IllegalArgumentException] {
      Curate.run(spark, sf, dir, tokenBudget = 32L, chunkWindow = 64)
    }
  }
}
