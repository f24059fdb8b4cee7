package graft.curation

import graft.{Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline — the registry's curation
  * operators composed into the single job a training-data team actually
  * runs, in the canonical order (each stage's rationale lives on the
  * corresponding oracle query):
  *
  *   1. quality gate        — a POLICY-parameterized rule: absolute
  *                            floor 0.05 on q83's scorer (default),
  *                            q141's per-source decile cut, or the
  *                            q145/q146 TRAINED classifier's global
  *                            decile cut (see [[QualityPolicy]])
  *   2. LM typicality gate  — q125's bigram-LM kernel, keep score >= lmFloor
  *   3. exact dedup         — q29's md5(text) groups, min-doc_id survivor
  *   4. near-dup prune      — the shared near-dup pair graph (q33's
  *                            LSH generation ≡ q32's exact pairs) +
  *                            q89's lose-to-higher-score rule
  *  4b. multimodal dedup    — the near-dup pair graphs (q128 image,
  *                            q131 video, q132 audio) plus the exact
  *                            fingerprint groups (q129 audio, q130
  *                            video), all via the factored fingerprint
  *                            seams, min-doc survivor
  *   5. decontamination     — q77's 5-gram overlap vs the eval probe set
  *  5b. semantic decontam   — q126's kernel: drop docs whose embedding
  *                            sits within `semThr` cosine of any eval
  *                            probe — the paraphrased-leakage class the
  *                            lexical 5-gram pass cannot see
  *   6. block rewrite       — q123's corpus-wide keep-first block dedup;
  *                            downstream stages see the REWRITTEN text
  *  6b. diversity thinning  — a POLICY-parameterized cluster-quota
  *                            sampler: identity (default) or q140's
  *                            mutual-kNN √-quota rule (see
  *                            [[SamplingPolicy]])
  *   7. mixture rebalance   — a POLICY-parameterized rate rule applied
  *                            via q93's hash filter: q84's equalizing
  *                            rates (default) or q136's temperature
  *                            mixture (see [[MixturePolicy]])
  *   8. chunking            — q100's fixed-context stride grid
  *   9. shard packing       — q101's chunk→shard composition over
  *                            ops.ShardPacking's two-pass prefix sum
  *  10. parquet shards      — partitioned by (source, shard_id)
  *
  * Stage order matters and is the industry-standard one: dedup before
  * decontamination (fewer docs to shingle), every filter before
  * mixture rebalancing (rates must reflect the CLEAN corpus or the
  * mixture under-delivers), chunking after every document-level
  * filter (a dropped doc's chunks must never exist), packing last
  * (shards are immutable artifacts). Shards hold CHUNKS, not ragged
  * documents: every training example is at most `chunkWindow` tokens,
  * so shard fill is tight — a 100k-token doc can no longer overshoot
  * a shard budget by its own length. Every stage is a pure function
  * of the input corpus —
  * no rand(), no timestamps — so the pipeline is bit-reproducible:
  * re-running on the same input yields byte-identical shard
  * assignments (CurateSpec pins this).
  *
  * Scale notes: stages communicate by doc_id (joins on the key, never
  * row position); the only corpus-sized shuffles are the ones the
  * underlying queries document (gram explode for decontamination,
  * md5-keyed dedup); the eval probe set, rate table, and pair list are
  * broadcast-sized. The write partitions by (source, shard_id), so
  * downstream training readers prune to their shard without listing
  * the corpus.
  */
object Curate {

  private val toksSql = "split(lower(text), ' ')"

  /** Stage 7's rate rule — the mixture-policy family the registry
    * already proves query-by-query, exposed as a pipeline parameter
    * the way stage 5 composes q133 and stage 4 composes q33. Every
    * policy resolves to a per-source hash-bucket cut in [0, 65536]
    * consumed by q93's reproducible filter, so the stage's plan shape
    * (one sources-sized rate frame broadcast into one corpus filter)
    * is policy-invariant.
    *
    * q103's epoch UPSAMPLING is deliberately not in this family: a
    * rate rule can only keep or drop (cut ≤ 65536), while epochs
    * REPLICATE docs — replication would break stage 8's ord-key
    * uniqueness contract (ord = doc_id·2^20 + chunk_start assumes one
    * instance per doc); a deployment wanting epochs widens the ord
    * encoding with an epoch field instead of bending the rate seam.
    */
  /** Stage 1's quality gate rule — like [[MixturePolicy]], a family
    * the registry proves query-by-query, exposed as a parameter.
    * Either member consumes the SAME q83 score frame the near-dup
    * survivor rule reads (one scoring pass per run).
    */
  sealed trait QualityPolicy
  object QualityPolicy {
    /** The default, unchanged behavior: keep score ≥ 0.05 — an
      * absolute floor in q83's linear-score units. */
    case object AbsoluteFloor extends QualityPolicy
    /** q141's per-source calibration: keep each source's top `keep`
      * deciles (0-9 scale; keep=8 drops every source's worst 20%).
      * The cut is domain-fair by construction — an absolute floor
      * silently empties sources that score systematically low (the
      * sf1-replica failure Curate's LM gate already works around);
      * deciles are computed on the post-eval-carveout corpus so held
      * -out docs never shift the quantile. */
    final case class SourceDeciles(keep: Int = 8) extends QualityPolicy
    /** q145/q146's TRAINED classifier as the gate: train the
      * fixed-point GD model on the post-carveout corpus (eval docs
      * never move the learned boundary — the SourceDeciles argument),
      * score every doc through the factored gdScores seam, keep the
      * top `keep` global deciles by learned score. A quantile cut,
      * not the absolute p ≥ Q/2 boundary — the DCLM/CCNet move, and
      * on this corpus the absolute boundary is degenerate (q146's
      * scaladoc has the account). Decile machinery is q141's:
      * BlockRanks global rank (range-split, no single-task window),
      * decile = (rk−1)·10 div n, all int64. */
    final case class TrainedDeciles(keep: Int = 8) extends QualityPolicy
  }

  /** Stage 6b's diversity-sampling rule — the third policy family
    * (after [[QualityPolicy]] and [[MixturePolicy]]), wiring q140's
    * oracle-proven cluster-quota sampler into the pipeline. */
  sealed trait SamplingPolicy
  object SamplingPolicy {
    /** The default, unchanged behavior: no cluster thinning — stage
      * 7's per-source hash-rate mixture is the pipeline's only
      * subsample. The default path adds ZERO actions and ZERO scans
      * (the stage is the identity). */
    case object HashRate extends SamplingPolicy
    /** q140's kernel (the SemDeDup/cluster-balancing shape): thin each
      * mutual-kNN embedding community to quota = isqrt(n_members) —
      * dense regions of embedding space are flattened, singletons
      * always survive, members chosen by the reproducible md5-slice
      * rank. The selection is computed CORPUS-WIDE through the
      * [[graft.queries.CurationOps.clusterQuotaRanked]] seam (exactly
      * the frame q140's oracle proves — the stage-4 convention: a
      * verdict derived from the full corpus applies to whatever
      * survivors remain) and docs without an embedding pass through,
      * the 5b rule. Uses the testdata vec_id == doc_id seam, like 5b. */
    case object ClusterQuota extends SamplingPolicy
  }

  sealed trait MixturePolicy
  object MixturePolicy {
    /** q84's equalizing rates (the default, unchanged behavior):
      * every source subsampled to the smallest source's clean token
      * count — cut_s = floor(min_tok/n_s · 65536). */
    case object Equalize extends MixturePolicy
    /** q136's temperature mixture at α = 1/2: expected kept tokens
      * ∝ isqrt(n_s), the one temperature exact in integers; the
      * smallest source keeps rate 1 (cut = 65536) and every other
      * source keeps cut_s = (65536·w_s·n_min) div (n_s·w_min) with
      * w = isqrt(n) — a pure integer rational evaluated in
      * decimal(38,0) (numerator ≤ 2^94 at a 2^52-token source, far
      * past 100 TB; int64 would overflow at ~2^31 min-source
      * tokens), clamped to 65536 (the rational exceeds it only when
      * the min source has single-digit tokens — isqrt floor error —
      * and any cut ≥ 65536 means keep-everything). Kept-token
      * expectation is then ∝ √n_s exactly for unclamped sources — the
      * q136 share realized by subsampling alone. */
    case object Temperature extends MixturePolicy
  }

  final case class Report(
      nInput: Long, nQuality: Long, nLmPass: Long, nExactDedup: Long,
      nNearDedup: Long, nMediaDedup: Long, nDecontaminated: Long, nSemClean: Long,
      nRewritten: Long, nThinned: Long, nSampled: Long, nChunks: Long,
      nShards: Long, nTokens: Long)

  /** The policy → per-source hash-bucket cut rule, factored so the
    * spec can pin exact cut values on a hand-built token frame.
    * `per` is (source, n_tokens); returns (source, cut) with
    * cut ∈ [0, 65536] consumed by q93's `bucket < cut` filter.
    */
  private[graft] def mixtureCuts(per: DataFrame,
      mixture: MixturePolicy): DataFrame = {
    val mn = per.agg(min(col("n_tokens")).as("min_tok"))
    mixture match {
      case MixturePolicy.Equalize =>
        per.crossJoin(broadcast(mn))
          .select(col("source"),
            floor((col("min_tok").cast("double") / col("n_tokens")) * 65536)
              .cast("long").as("cut"))
      case MixturePolicy.Temperature =>
        // cut_s = (65536·w_s·n_min) div (n_s·w_min), w = isqrt(n):
        // exact integer rational in decimal(38,0); isqrt is monotone,
        // so isqrt(min n) IS the minimizing source's weight. The
        // rational can exceed 65536 when the min source's token count
        // is single-digit (isqrt floor error, e.g. n={3,4} gives
        // cut_4 = 98304) — clamp to keep the documented cut ∈
        // [0, 65536] invariant; `bucket < cut` semantics are unchanged
        // (both mean keep-everything).
        per.crossJoin(broadcast(mn))
          .withColumn("__num",
            lit(65536L).cast("decimal(38,0)")
              * graft.queries.CurationOps.isqrt(col("n_tokens")).cast("decimal(38,0)")
              * col("min_tok").cast("decimal(38,0)"))
          .withColumn("__den",
            col("n_tokens").cast("decimal(38,0)")
              * graft.queries.CurationOps.isqrt(col("min_tok")).cast("decimal(38,0)"))
          .select(col("source"),
            least(expr("__num div __den"), lit(65536L)).as("cut"))
    }
  }

  /** Run the full pipeline; write shards under `outDir`; return the
    * per-stage funnel. `evalIds` marks the held-out eval docs used as
    * the decontamination probe set (they never enter the corpus).
    *
    * Each stage's frame is persisted before its funnel count and
    * released once the NEXT stage has materialized: without this,
    * every count() re-executes the whole chain from the scan — six
    * actions = O(stages²) corpus passes, invisible at fixture scale
    * and ruinous at 100 TB. Storage held at any moment is at most two
    * stages (current + successor), linear like the pipeline itself.
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      tokenBudget: Long = 4096L, evalIdBelow: Long = 10L,
      chunkWindow: Int = 64, chunkStride: Int = 48,
      lmTailFrac: Double = 0.02, semThr: Double = 0.30,
      mixture: MixturePolicy = MixturePolicy.Equalize,
      qualityPolicy: QualityPolicy = QualityPolicy.AbsoluteFloor,
      samplingPolicy: SamplingPolicy = SamplingPolicy.HashRate,
      verbose: Boolean = false): Report = {
    qualityPolicy match {
      case QualityPolicy.SourceDeciles(k) =>
        require(k >= 1 && k <= 10, s"SourceDeciles.keep must be 1..10, got $k")
      case QualityPolicy.TrainedDeciles(k) =>
        require(k >= 1 && k <= 10, s"TrainedDeciles.keep must be 1..10, got $k")
      case QualityPolicy.AbsoluteFloor => ()
    }
    require(chunkWindow > 0 && chunkStride > 0 && chunkStride <= chunkWindow,
      "need 0 < chunkStride <= chunkWindow (stride > window would skip tokens)")
    require(chunkWindow <= tokenBudget,
      "a single chunk must fit a shard: chunkWindow <= tokenBudget")
    // per-stage wall laps, printed only when the caller asks (CurateAudit
    // does) — a library API stays quiet by default
    var __t = System.nanoTime()
    def lap(l: String): Unit = {
      if (verbose) println(f"[curate-stage] $l ${(System.nanoTime() - __t) / 1e9}%.1f s")
      __t = System.nanoTime()
    }
    val docs = T.documentsSpread(spark, sfDir)
      .filter(col("doc_id") >= evalIdBelow)
      .persist()
    val nInput = docs.count(); lap("input")

    // 1. quality gate — the policy-selected rule over ONE q83 score
    // frame (the same frame stage 4's survivor rule reads)
    val scored = graft.queries.CurationOps.qualityScored(spark, sfDir)
      .filter(col("doc_id") >= evalIdBelow)
      .select(col("doc_id"), col("score"))
    // persisted whichever branch built it: `quality` is evaluated at
    // least 4 times (funnel count, lmScored's pair/unigram scans, the
    // lmPass join) and `docs` is released right after the count below —
    // without this every re-evaluation recomputes the parquet scan +
    // score join (the round-19 policy refactor dropped it; ADVICE r19)
    val quality = (qualityPolicy match {
      case QualityPolicy.AbsoluteFloor =>
        docs.join(scored.filter(col("score") >= 0.05), "doc_id")
      case QualityPolicy.SourceDeciles(k) =>
        // q141's kernel on the post-carveout corpus: the decile frame
        // is corpus-narrow and left-semi keeps the frame shape
        // identical to the floor path (score column included — stage
        // 4 reads the separate `scored` frame either way)
        val dec = graft.queries.CurationOps
          .sourceDeciles(spark, sfDir, evalIdBelow)
          .filter(col("decile") < k).select(col("doc_id"))
        docs.join(scored, "doc_id").join(dec, Seq("doc_id"), "left_semi")
      case QualityPolicy.TrainedDeciles(k) =>
        // train on the post-carveout corpus, score through the
        // factored seam, global decile on the LEARNED z (q141's rank
        // shape on one block; the score frame is corpus-narrow and
        // its count is one cheap agg on the checkpointed design
        // matrix)
        val C = graft.queries.CurationOps
        val (fx, _, _, w3) = C.gdRounds(spark, sfDir, evalIdBelow)
        // count from the checkpointed design matrix, NOT from `ranked`
        // (same universe — every fx row scores), so the rank chain is
        // never re-derived for a scalar (the q141 doubled-scan lesson).
        // Driver-side scalar, not a crossJoin'd agg frame: it doubles
        // as the gdStep non-emptiness guard (ADVICE r20 — an empty
        // post-carveout matrix trains null weights that silently keep
        // nothing) and a count on checkpoint blocks is one cheap job.
        val nFx = fx.count()
        require(nFx > 0,
          s"TrainedDeciles: empty design matrix after carveout (evalIdBelow=$evalIdBelow) — " +
            "gdRounds would train null weights; lower the carveout or use another QualityPolicy")
        val z = C.gdScores(fx, w3).withColumn("__blk", lit(0L))
        // nFx is exactly the rank input's row count (every fx row
        // scores), so hand it to BlockRanks: below the 32k threshold
        // the plain-window form skips the split path's three extra
        // stages (range-sample job, checkpoint, offset join); above
        // it the scale-safe split runs as before (round 21, guide
        // §2.4 — the q141/q142 knownRows discipline applied here)
        val ranked = graft.ops.BlockRanks.withBlockRank(
          z, "__blk", Seq(col("z").desc, col("doc_id")), "rk",
          knownRows = nFx)
        val dec = ranked
          .filter(expr(s"(rk - 1) * 10 div $nFx") < k)
          .select(col("doc_id"))
        docs.join(scored, "doc_id").join(dec, Seq("doc_id"), "left_semi")
    }).persist()
    val nQuality = quality.count(); lap("quality")
    docs.unpersist()

    // 2. LM typicality gate (q125's kernel): the bigram LM is trained
    // on the quality-passed corpus itself and drops the low-typicality
    // TAIL — a QUANTILE cut, not a fixed floor (CCNet's perplexity
    // buckets are quantile-based for exactly this reason: absolute
    // scores shift with corpus composition — the sf1 replica corpus
    // scores systematically lower and a fixed floor silently emptied
    // the funnel there). The threshold is the `lmTailFrac` order
    // statistic of a 256-doc deterministic sample (q113's KMV idea:
    // smallest xxhash64(doc_id) values — no corpus sort, bounded rows,
    // bit-reproducible). The train frame is the seam where a curated
    // reference corpus would plug in.
    val lmScores = graft.queries.CurationOps.lmScored(quality)
      .select(col("doc_id"), col("lm_score"))
    val kSample = 256
    val cutIdx = math.max(1, (kSample * lmTailFrac).toInt)
    val lmThr = lmScores
      .select(col("lm_score"), xxhash64(col("doc_id")).as("__h"))
      .orderBy(col("__h")).limit(kSample)
      .orderBy(col("lm_score")).limit(cutIdx)
      .agg(max(col("lm_score")).as("__lm_floor"))
    // left join + null pass-through: lmScored emits no row for docs
    // with fewer than 2 non-empty tokens (a bigram LM has nothing to
    // score), and an inner join would silently DROP those docs — a
    // stricter cut than the documented quantile tail. Unscoreable docs
    // pass this gate; the quality gate above already judged them.
    val lmPass = quality.join(lmScores, Seq("doc_id"), "left")
      .crossJoin(broadcast(lmThr))
      .filter(col("lm_score").isNull || col("lm_score") >= col("__lm_floor"))
      .drop("lm_score", "__lm_floor")
      .persist()
    val nLm = lmPass.count(); lap("lm")
    quality.unpersist()

    // 3. exact dedup: min doc_id survives its md5(text) group (q29)
    val wHash = Window.partitionBy(md5(col("text")))
    val exact = lmPass.withColumn("__keep", col("doc_id") === min(col("doc_id")).over(wHash))
      .filter(col("__keep")).drop("__keep")
      .persist()
    val nExact = exact.count(); lap("exact")
    lmPass.unpersist()

    // 4. near-dup prune: the shared near-dup pair graph (q33's LSH
    // generation, ≡ q32's exact output — LlmOps.nearDupPairs' doc),
    // q89's survivor rule
    // EAGER checkpoint: `pairs` feeds BOTH union branches below and
    // Catalyst plans each occurrence independently — unmaterialized,
    // the whole LSH generation (shingle → minhash → band join →
    // Jaccard verify) ran twice (the q107 round-16 lesson). The pair
    // graph is output-sized (edges between near-dups), tiny next to
    // the corpus scan that produces it.
    val pairs = graft.queries.LlmOps.nearDupPairs(spark, sfDir)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint()
    val e = pairs.select(col("id_a").as("me"), col("id_b").as("other"))
      .union(pairs.select(col("id_b").as("me"), col("id_a").as("other")))
    val losers = e
      .join(scored.select(col("doc_id").as("me"), col("score").as("my_score")), "me")
      .join(scored.select(col("doc_id").as("other"), col("score").as("other_score")), "other")
      .filter(col("other_score") > col("my_score") ||
        (col("other_score") === col("my_score") && col("other") < col("me")))
      .select(col("me").as("doc_id")).distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
      .persist()
    val nNear = nearDeduped.count(); lap("near")
    exact.unpersist()

    // 4b. MULTIMODAL dedup (round 16; video + the near-dup arms added
    // round 17): the corpus's rendered media deduped through the same
    // factored seams the oracle-gated queries verify —
    //   NEAR: q128's perceptual image pairs, q131's video pairs,
    //   q132's audio pairs (each a capped blocked cosine ≥ 0.95;
    //   pairs carry id_a < id_b, so dropping every id_b is the
    //   min-doc-survivor rule);
    //   EXACT: q129's audio and q130's video fingerprint groups (all
    //   but the min doc_id of each band-energy group) — kept even
    //   though the near arms catch cosine-1.0 pairs, because the rank
    //   cap makes the near arms' coverage of a >1024-member exact
    //   clique heuristic while the group rule is provably total.
    // All graphs are computed CORPUS-WIDE and losers subtracted from
    // the current survivors — the stage-4 nearDupPairs convention (a
    // winner the funnel already dropped still eliminates its copies).
    // Scale shape: three capped blocked joins + two map-side-combined
    // fingerprint exchanges, all linear in the corpus (q128-q132's
    // documented contracts); nothing corpus-sized is broadcast.
    // Each modality's render+decode pass is the stage's dominant cost
    // and feeds TWO consumers (the exact group rule and the near-dup
    // kernel) — Catalyst plans each occurrence independently, so
    // without a checkpoint at this fan-out the WAV and AVI walks ran
    // twice per pipeline run (the round-9 multi-branch rule; A/B'd at
    // sf1 in SCALING round 17). The bands frames are 16 longs/doc.
    //
    // Checkpoint-block lifetime: this stage creates several
    // localCheckpoint frames (the two bands frames here plus the
    // fingerprint/rank checkpoints inside the three kernels), and
    // checkpoint blocks are NOT released by unpersist()-style stage
    // hygiene — they sit in BlockManager storage until the driver GC
    // happens to run the ContextCleaner (the round-11 bench finding).
    // So the stage (a) tracks every checkpoint RDD it creates by
    // diffing getPersistentRDDs around the frame construction, (b)
    // funnels all downstream lineage through ONE small checkpointed
    // loser frame, and (c) releases the tracked blocks once the loser
    // frame exists — safe exactly because nothing downstream can reach
    // the released (unrecomputable) blocks through `losers` anymore.
    val P = graft.queries.PipelineOps
    val nDocs = P.nonEmptyDocCount(spark, sfDir)
    val cpBefore = spark.sparkContext.getPersistentRDDs.keySet
    val aBands = P.audioBands(spark, sfDir).localCheckpoint()
    val vBands = P.videoBands(spark, sfDir).localCheckpoint()
    val nearLosers = Seq(
      P.perceptualDupPairs(spark, sfDir),
      P.videoNearDupPairsFrom(spark, vBands, nDocs),
      P.audioNearDupPairsFrom(spark, aBands, nDocs))
      .map(_.select(col("id_b").as("doc_id")))
      .reduce(_ union _)
    def fpLosers(fp: DataFrame): DataFrame = {
      val wFp = Window.partitionBy(col("fp"))
      fp.withColumn("__keep", col("doc_id") === min(col("doc_id")).over(wFp))
        .filter(!col("__keep")).select(col("doc_id"))
    }
    // every eager checkpoint of the stage exists NOW; snapshot their ids
    // BEFORE the losers frame adds its own persisted RDD
    val mediaCpIds = spark.sparkContext.getPersistentRDDs.keySet -- cpBefore
    // loser-id-sized; eager, so every upstream checkpoint is consumed
    // (and releasable) the moment this returns
    val mediaLosers = nearLosers.union(fpLosers(P.bandsFp(aBands)))
      .union(fpLosers(P.bandsFp(vBands)))
      .distinct()
      .localCheckpoint()
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => mediaCpIds.contains(id) }
      .valuesIterator.foreach(_.unpersist(blocking = true))
    val mediaDeduped = nearDeduped
      .join(mediaLosers, Seq("doc_id"), "left_anti")
      .persist()
    val nMedia = mediaDeduped.count(); lap("media")
    nearDeduped.unpersist()

    // 5. decontamination: drop docs sharing any 5-gram with the eval
    // set — q133's Bloom pre-screen in front of q77's exact join
    // (round 18; the stage previously shingle-joined EVERY survivor
    // against the broadcast probe set). The constant-size bitmap frame
    // (≤4096 rows regardless of blocklist size) screens the whole
    // corpus through four broadcast word-index joins; the Bloom test
    // has ZERO false negatives, so the exact q77 pass — the only part
    // that must see the probe shingles themselves — runs on just the
    // flagged sliver and the final verdict is BIT-IDENTICAL to the
    // unscreened stage (CurateSpec pins this equivalence). At 100 TB
    // with a multi-TB blocklist the probe set stops broadcasting but
    // the bitmap does not grow; the exact join then shuffles
    // sliver-sized, not corpus-sized — the scale regime q133's
    // scaladoc documents, now composed rather than promised.
    val grams = (df: DataFrame) => df
      .select(col("doc_id"), expr(s"filter($toksSql, t -> t <> '')").as("ts"))
      .filter(size(col("ts")) >= 5)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.GraftFunctions.ngrams(col("ts"), 5))).as("g"))
    val TO = graft.queries.TrainingOps
    // tiny (distinct grams of the eval docs) but it fans into the
    // bitmap build AND the exact join — checkpoint the fan-out
    val probe = grams(T.documents(spark, sfDir).filter(col("doc_id") < evalIdBelow))
      .select(col("g")).distinct()
      .localCheckpoint()
    // the bitmap frame fans into FOUR broadcast builds (the q133
    // convention — Catalyst does not share identical subplans)
    val words = TO.bloomWords(probe).localCheckpoint()
    val flagged = TO.bloomProbeFlagged(TO.bloomGrams(mediaDeduped), words)
      .select(col("doc_id"))
    val contaminated = grams(
        mediaDeduped.join(flagged, Seq("doc_id"), "left_semi"))
      .join(broadcast(probe), "g")
      .select(col("doc_id")).distinct()
    val clean = mediaDeduped.join(contaminated, Seq("doc_id"), "left_anti")
      .persist()
    val nClean = clean.count(); lap("decontam")
    mediaDeduped.unpersist()

    // 5b. SEMANTIC decontamination (q126's kernel): drop docs whose
    // embedding is within `semThr` cosine of any eval probe — the
    // paraphrased-leakage class stage 5's lexical n-gram overlap cannot
    // see (a paraphrase shares no 5-gram with its source but sits next
    // to it in embedding space). The corpus↔embedding seam is the
    // testdata convention vec_id == doc_id; a production pipeline joins
    // on its own doc→vector key the same way. Docs without an embedding
    // pass through (left-anti drops only POSITIVE flags) — the lexical
    // pass above already judged their text. Probe embeddings are
    // broadcast-sized by nature (eval sets are small); the corpus pass
    // is map-side dots + one vec-keyed argmax exchange, linear.
    val semFlagged = graft.queries.CurationOps
      .semanticNearest(T.embeddings(spark, sfDir), evalIdBelow)
      .filter(col("cosine") >= semThr)
      .select(col("vec_id").as("doc_id"))
    val semClean = clean.join(semFlagged, Seq("doc_id"), "left_anti")
      .persist()
    val nSemClean = semClean.count(); lap("semdecontam")
    clean.unpersist()

    // 6. block-level keep-first rewrite (q123's kernel), placed AFTER
    // decontamination: the decon verdict is doc-level on pre-rewrite
    // text (conservative — a doc is dropped even when its contaminated
    // block would have been cut anyway), while everything downstream —
    // mixture token rates, chunk grids, shard fill — must see the
    // REWRITTEN corpus, or the rates and budgets describe text the
    // trainer will never consume. Docs whose every block is a repeat
    // vanish here (kept text empty).
    // localCheckpoint, not persist: the rewrite joins the corpus frame
    // against an aggregate OF ITSELF, and stacking that join-on-self
    // lineage under the five stages above it sent the ANALYSIS/
    // optimization cost of every downstream plan superlinear (measured
    // 27 s -> 90 s wall at sf0.01 with identical task counts — the
    // time was driver-side, between jobs). The checkpoint starts
    // downstream plans from a LogicalRDD. Blocks live until session
    // end; a 100 TB deployment would write/drop an intermediate table
    // here, same shape.
    val rewritten = semClean.drop("text")
      .join(graft.queries.TrainingOps.blockKeptText(semClean)
          .filter(length(col("kept_text")) > 0)
          .select(col("doc_id"), col("kept_text").as("text")),
        "doc_id")
      .localCheckpoint()
    val nRewritten = rewritten.count(); lap("rewrite")
    semClean.unpersist()

    // 6b. cluster-diversity thinning — the policy-selected sampler
    // (q140's SemDeDup-shape √-quota rule, or the identity default).
    // Placed with the other document-level filters, BEFORE stage 7:
    // mixture rates must reflect the thinned corpus or the mixture
    // over-delivers exactly the dense regions thinning just flattened.
    val (thinned, nThinned) = samplingPolicy match {
      case SamplingPolicy.HashRate =>
        // identity: no action runs, so no lap is recorded — a "thin"
        // lap on this path would time nothing and mislead audit-output
        // timing analysis (ADVICE r20)
        (rewritten, nRewritten)
      case SamplingPolicy.ClusterQuota =>
        // the REJECTED side (rk > quota) of q140's corpus-wide ranked
        // frame; docs without an embedding never appear in it and pass
        // through (the 5b convention). The reject list is
        // membership-frame-sized — everything corpus-scale stays
        // inside q139's documented pipeline, no new corpus scans.
        val rejected = graft.queries.CurationOps
          .clusterQuotaRanked(spark, sfDir)
          .filter(col("rk") > col("quota"))
          .select(col("vec_id").as("doc_id"))
        // checkpointed like `rewritten` (it replaces it as the stage-7
        // fan-out root: the token projection reads it twice). NOTE:
        // this stacks a SECOND full corpus frame of un-releasable
        // checkpoint blocks on top of `rewritten`'s (localCheckpoint
        // blocks live until session end — the standing stage-6
        // account); the opt-in policy's memory cost is that extra
        // corpus-frame residency, the 100 TB shape would write/drop an
        // intermediate table for both.
        val t = rewritten.join(rejected, Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val n = t.count(); lap("thin")
        (t, n)
    }

    // 7. mixture rebalance on the CLEAN, REWRITTEN corpus: the
    // policy-selected rate rule (q84 equalize / q136 temperature),
    // applied via q93's reproducible hash filter. Both policies share
    // the same plan shape — one sources-sized token agg, one
    // broadcast totals row, one broadcast rate join — so swapping
    // policy never adds a corpus scan.
    val withTok = thinned.withColumn("n_tok",
      expr(s"size(filter($toksSql, t -> t <> ''))"))
    val per = withTok.groupBy(col("source")).agg(sum(col("n_tok")).cast("bigint").as("n_tokens"))
    val rates = mixtureCuts(per, mixture)
    val sampled = withTok
      .withColumn("__bucket",
        expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as int)"))
      .join(broadcast(rates), "source")
      .filter(col("__bucket") < col("cut"))
      .drop("__bucket", "cut")
      .persist()
    val nSampled = sampled.count(); lap("sample")

    // 8. chunking (q100's stride grid) — the sampled docs become
    // fixed-context training examples. chunk_text slices the SAME
    // token array the counts use, inside one projection, so there is
    // no second tokenize pass and nothing array-typed crosses a
    // shuffle. The ord key is q101's (doc_id << 20 | chunk_start)
    // encoding with BOTH halves of its contract enforced in-plan.
    val chunked = sampled
      .filter(col("n_tok") > 0)
      .withColumn("toks", expr(s"filter($toksSql, t -> t <> '')"))
      .select(col("source"), col("doc_id"), col("lang"), col("toks"), col("n_tok"),
        explode(expr(s"sequence(0, n_tok - 1, $chunkStride)")).as("chunk_start"))
      .select(col("source"), col("doc_id"), col("lang"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkWindow.toLong), col("n_tok") - col("chunk_start"))
          .cast("long").as("nc"),
        array_join(expr(s"slice(toks, chunk_start + 1, $chunkWindow)"), " ")
          .as("chunk_text"),
        (col("doc_id") * (1L << 20) +
          when(assert_true(
            col("chunk_start") < (1L << 20) && col("doc_id") < (1L << 43),
            lit("Curate: doc exceeds the 2^20-token ord-encoding cap " +
              "or doc_id exceeds the 2^43 id cap")).isNull,
            col("chunk_start"))).as("ord"))
      .persist()
    val nChunks = chunked.count(); lap("chunk")
    sampled.unpersist()

    // 9. chunk -> shard packing (q101's composition over q78's
    // two-pass block-decomposed prefix sum — no single-task-per-source
    // window; see ops.ShardPacking)
    val packed = graft.ops.ShardPacking
      .assignShards(chunked, "source", "ord", "nc", tokenBudget)

    // 10. immutable shard artifacts, prunable by (source, shard_id).
    // nTokens counts chunk tokens as written — with stride < window
    // the overlap region is intentionally double-counted, because
    // that IS what the trainer will consume.
    packed
      .select(col("source"), col("shard_id"), col("doc_id"),
        col("chunk_start"), col("nc"), col("lang"), col("chunk_text"))
      .write.mode("overwrite").partitionBy("source", "shard_id")
      .parquet(s"$outDir/shards")
    lap("pack+write")

    chunked.unpersist()
    val written = spark.read.parquet(s"$outDir/shards")
    val nShards = written.select(col("source"), col("shard_id")).distinct().count(); lap("nShards")
    val nTokens = Option(written.agg(sum(col("nc"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L); lap("nTokens")
    Report(nInput, nQuality, nLm, nExact, nNear, nMedia, nClean, nSemClean,
      nRewritten, nThinned, nSampled, nChunks, nShards, nTokens)
  }
}
