package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star — the
  * O(log n)-round MapReduce formulation (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC'14; public algorithm) —
  * as the scale twin of [[graft.queries.TrainingOps.minLabelClusters]]:
  * min-label propagation needs O(graph diameter) rounds, which on a
  * 100 TB near-dup graph with chain-shaped duplicate clusters (crawl
  * mirrors of mirrors) can be thousands; star-contraction needs
  * O(log n) rounds regardless of diameter, every round two keyed
  * shuffles over the CURRENT edge set, which only shrinks.
  *
  *  - large-star: per node u, link every LARGER neighbor to the
  *    minimum of u's closed neighborhood — safe at any skew because
  *    that minimum is a map-side-combined partial aggregate (never a
  *    window over the hub's full adjacency in one task).
  *  - small-star: per node u, link every neighbor ≤ u (and u) to that
  *    minimum — contracts the stars the large-star built.
  *
  * Both steps preserve connectivity exactly (proved in the paper; the
  * spec pins equality with union-find on generated graphs and with
  * minLabelClusters on the real pair graph). Convergence = the edge
  * multiset is a fixpoint (every node points directly at its
  * component minimum), detected by an order-insensitive
  * (XOR-of-xxhash64, count) checksum — XOR rather than SUM because
  * the edge set is distinct (no self-cancelling multiset) and XOR
  * cannot overflow under ANSI mode; one scalar pair per round, no
  * edge collect. Rounds
  * localCheckpoint: the per-round frames are edge-sized and lineage
  * must not accumulate across O(log n) iterations.
  *
  * Returns (v, lbl): every vertex of the input with its component's
  * minimum vertex id as label — [[minLabelClusters]]'s contract.
  */
object ConnectedComponents {

  def largeStarSmallStar(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // canonical directed form: (hi -> lo) for every input edge, plus
    // self-loops dropped; the iteration maintains edges as (src, dst)
    // with no orientation invariant (stars re-orient freely).
    // LAZY checkpoint (round 21): round 1's one checksum action
    // materializes it — the same lazy-checkpoint-plus-action fold as
    // `large`/`small` below, saving the eager form's dedicated
    // materialization job. The race bound is the same argument as
    // `large`'s: the frame ends in the distinct's shuffle, so the two
    // union branches of round 1's neighborhood frame read one
    // shuffleId's output — concurrent branches can at worst re-run the
    // reduce-side projection, never the caller's edge derivation.
    var edges = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
      .distinct()
      .localCheckpoint(eager = false)

    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(greatest(col("src"), col("dst")).as("h"),
          least(col("src"), col("dst")).as("l"))
        .agg(bit_xor(xxhash64(col("h"), col("l"))), count(lit(1))).head()
      (Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L), r.getLong(1))
    }

    // No checksum of the INPUT edge set (round 21): convergence is
    // detected by two consecutive ROUND outputs agreeing, so the
    // baseline action over the full input frame bought exactly one
    // thing — declaring an already-fixpoint input converged after one
    // round instead of two. Real caller graphs (raw near-dup /
    // mutual-kNN pair frames) are never pre-contracted stars, so the
    // dropped action is pure saving; the one corner pays one extra
    // round over an already-star-shaped (i.e. component-sized) edge
    // set. Output is the same fixpoint either way.
    var prev: Option[(Long, Long)] = None
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= 64, "star contraction failed to converge in 64 rounds")
      // ---- large-star ----
      // neighborhood of u (both directions), m = min(Γ(u) ∪ {u});
      // emit (v, m) for strictly larger neighbors v > u.
      // m comes from groupBy+min — a PARTIAL aggregate with map-side
      // combine — joined back on u, NOT from min().over(Window
      // .partitionBy(u)): WindowExec buffers a node's entire adjacency
      // in one task, a straggler/OOM hazard on exactly the mega-hub
      // graphs (boilerplate pages, degree 10^7+) this class exists to
      // handle. The join back streams per-row (sort-merge buffers only
      // the single matching min row per key), and AQE is free to
      // broadcast the node-sized min frame.
      val nbrs = edges.select(col("src").as("u"), col("dst").as("v"))
        .union(edges.select(col("dst").as("u"), col("src").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(least(col("v"), col("u"))).as("m"))
      // LAZY checkpoint (round 19): the round's ONE action — the
      // small-star checksum below — materializes this too, halving
      // the per-round job count (the q98/q107 scheduling-floor class;
      // measured 3.46 → 3.15 s q139 solo at sf0.1, labels identical,
      // still 6 rounds). The repo's eager-at-fan-out rule exists for
      // frames whose COMPUTATION races when branches of one job reach
      // an unmaterialized cache (q98's measured 7× inflation); here
      // the race is bounded by construction: `large` is one RDD
      // object, so its shuffle map stages are deduplicated by
      // shuffleId in the DAG scheduler — concurrent branches can at
      // worst re-run the reduce-side projection over already-written
      // shuffle files, never the corpus-side work.
      //
      // INVARIANT (load-bearing, not style): `large` must stay
      // lazy-paired with the ONE checksum action at the bottom of this
      // round. The shuffle-dedup argument above only bounds the race
      // WITHIN a single job — adding any action between here and
      // `checksum(small)` (a debug count, a convergence metric, an
      // eager checkpoint of a derived frame) splits the round into two
      // jobs that each reach this unmaterialized checkpoint and
      // silently reintroduces the q98-class concurrent-first-
      // computation race the old eager checkpoint existed to prevent.
      // If you need a mid-round action, flip this back to
      // localCheckpoint() (eager) first.
      val large = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(eager = false)
      // ---- small-star ---- (same partial-agg shape; the (u, m) branch
      // reads the one-row-per-node min frame directly instead of the
      // per-neighbor-duplicated join output)
      val nbrs2 = large.select(col("src").as("u"), col("dst").as("v"))
        .union(large.select(col("dst").as("u"), col("src").as("v")))
      val mins2 = nbrs2.groupBy(col("u"))
        .agg(min(least(col("v"), col("u"))).as("m"))
      // LAZY checkpoint: the checksum action below is the round's one
      // materialization pass — it computes `large`, then small,
      // writes both frames' checkpoint blocks, and aggregates the
      // convergence scalar in a single job (the round-11
      // lazy-checkpoint-plus-action pattern).
      val small = nbrs2.join(mins2, "u")
        .filter(col("v") <= col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .union(mins2.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .localCheckpoint(eager = false)
      // the round's ONE action — see the invariant note on `large`
      // above: do not add actions between `large` and this call
      val cs = checksum(small)
      converged = prev.contains(cs)
      prev = Some(cs)
      edges = small
    }
    // round-count diagnostic is opt-in: this is library code, and an
    // unconditional stderr print would fire for every embedding caller
    // (round-15 advice). GRAFT_CC_DEBUG=1 turns it on for forensics.
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] large/small-star converged in $rounds rounds")
    // Fixpoint shape (round 21 — relied on, so proved here): converged
    // means one more large+small round leaves the edge SET unchanged,
    // and a stable set is necessarily a disjoint union of stars rooted
    // at component minima. Sketch: small-star output always has
    // src > dst (the emitted dst is a closed-neighborhood minimum), so
    // suppose the stable set held (a→b) AND (b→c) — b both pointed-at
    // and pointing. Large-star on b's neighborhood {a, c, …} re-links
    // a to min(Γ(b)∪{b}) ≤ c < b, so (a→b) leaves the set, and no
    // small-star node can re-emit b as a neighborhood minimum once a's
    // neighborhood contains that smaller node — the set changed,
    // contradiction. Hence at the detected fixpoint no dst is ever a
    // src: the dst side is EXACTLY the component minima, and the roots
    // are `edges.dst.distinct` directly — the anti-join the first cut
    // used to separate roots from members re-derived that set the hard
    // way (two node-sized distincts + an anti-join, ~3 exchanges per
    // consumer occurrence of the label frame). The spec pins equality
    // with union-find and minLabelClusters on real + generated graphs,
    // planted-star cases included.
    val labeled = edges.select(col("src").as("v"), col("dst").as("lbl"))
    val roots = edges.select(col("dst").as("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    labeled.union(roots)
  }
}
