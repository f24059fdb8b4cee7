package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-evidence dump: `.explain("formatted")` for a representative
  * slice of the registry, written to one markdown file (PLANS.md in the
  * repo). Not part of the driver contract — a human-facing artifact
  * showing the physical properties the specs assert: pushed filters,
  * pruned schemas, broadcast placement, whole-stage codegen spans,
  * Expand for multi-distinct, partial aggregation.
  *
  * Usage: `sbt "runMain graft.Plans /root/testdata/sf0.01 PLANS.md"`
  */
object Plans {

  /** name → why this plan is worth reading. */
  private val picks: Seq[(String, String)] = Seq(
    "q01_pricing_summary" -> "scan: pushed date filter + pruned columns; partial hash agg below the shuffle",
    "q05_region_revenue" -> "star join: two broadcast dims, fact-side shuffles only on join keys",
    "q14_topk_orders" -> "TakeOrderedAndProject — top-k without a global sort",
    "q33_minhash_lsh_dup" -> "LSH: native minhash64 inside codegen, candidate join keyed on (band, bucket)",
    "q41_html_extract" -> "native parse_page evaluated once, above the range-sort (sampler must not re-parse)",
    "q60_ann_ivf" -> "IVF: codebook + query sides broadcast, corpus cells shuffle once",
    "q71_cms_heavy_hitters" -> "typed Aggregator with map-side partial reduce (ObjectHashAggregate)",
    "q75_column_profile" -> "one scan, Expand-planned multi-column count-distinct, stack unpivot",
    "q77_decontaminate" -> "broadcast probe shingles; native ngrams in the codegen stage",
    "q85_vocab_oov" -> "top-100 vocab via TakeOrderedAndProject, broadcast back over the token stream",
    "q87_embed_cell_dedup" -> "SemDeDup: broadcast codebook assignment, within-cell pair join keyed on cent_id",
    "q91_range_binned" -> "non-equi range predicate executed as a hash equi-join on the bin id (no nested loop)",
    "q94_containment_dedup" -> "asymmetric prefix filter: contained side pruned, index side full, shingle-keyed candidates",
    "q104_winnowing" -> "winnowing: one doc-keyed window exchange computing both count and frame-min; packed 8-byte values",
    "q107_graph_pagerank" -> "five PageRank iterations: edges scanned from checkpoint, rank/degree BROADCAST each round — no edge shuffle in the loop",
    "q108_quantized_ann" -> "two-stage ANN: broadcast query codes, integer-dot candidate window, float re-rank window over 20/query",
    "q122_ivfpq_search" -> "IVF-PQ serving path: map-side l2argmin routing (no corpus window), broadcast distance tables ON cell_id, WindowGroupLimit-pruned shortlist, broadcast-shortlist refine — constant shuffle across three decades",
    "q124_bpe_merges" -> "BPE training: one corpus histogram agg, then vocabulary-sized merge rounds — the overlap rule as a single chained window pass per round (one exchange, fused WindowExecs)",
    "q96_novelty_curve" -> "novelty without a gram-sized join-back: distinct (batch, gram-hash) explode, then per-batch counts and a first-batch regroup joined at 10 rows",
    "q128_perceptual_dedup" -> "multimodal→ANN composition: mapPartitions PPM decode at the codec seam, centered integer fingerprints, blocked self-join with the native dot kernel — the fingerprint subtree computed once (exchange reuse across the join sides)",
    "q131_video_near_dup" -> "the shared banded-cosine kernel on DECODED video energies: checkpointed scaled fingerprints (ExistingRDD scan, no parquet below the kernel), the hash(blk) exchange reused across both self-join sides, broadcast b-side with the explicitly repartitioned probe",
    "q137_bm25_topk" -> "BM25 over q120's checkpointed posting build: broadcast query side + broadcast 2-long stats row, dl joined candidate-sized, per-pair sorted-fold above ONE (query_id, doc_id) exchange, WindowGroupLimit rank cut — zero SortMergeJoins, nothing corpus-broadcast",
    "q141_quality_calibrate" -> "per-source calibration: one integer feature scan, decimal(38,0) fixed-point projection, BlockRanks range-split rank (no single-task hot-source window), broadcast sources-sized count join",
    "q143_quality_rank_fusion" -> "ensemble RRF: two independent signal chains (checkpointed at their range splits), two p-way global ranks, one doc-keyed left join — no global window, no score-scale mixing",
    "q145_quality_train" -> "trained classifier, one GD round visible per scan: checkpointed design matrix read as a LogicalRDD, crossJoin of the one-row broadcast weight frame, five-sum partial agg (map-side combine) to a single row — no parameter server, no driver loop over rows",
    "q146_quality_apply" -> "trained classifier apply: round-3 weight row broadcast into one per-row codegen projection over the checkpointed design matrix; the only exchange is the output sort")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outFile) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb ++= "# PLANS — formatted physical plans for representative queries\n\n"
    sb ++= s"Generated by `graft.Plans` at $sfDir. Regenerate: " +
      "`sbt \"runMain graft.Plans /root/testdata/sf0.01 PLANS.md\"`.\n"
    val qs = SparkEntry.queries
    picks.foreach { case (name, why) =>
      val df = qs(name)(spark, sfDir)
      sb ++= s"\n## $name\n\n$why\n\n```\n"
      sb ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb ++= "```\n"
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    spark.stop()
  }
}
