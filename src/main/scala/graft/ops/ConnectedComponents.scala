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
  * set is a fixpoint (every node points directly at its component
  * minimum), detected STRUCTURALLY in the round that produces it —
  * the output is a star forest, a per-vertex local property (see
  * `isStarForest` below) — rather than by comparing consecutive round
  * checksums, which pays one extra full round to re-derive the same
  * set. One scalar per round, no edge collect. Rounds
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

    /** STRUCTURAL convergence probe (round 21, optimization 1): the
      * round output is a fixpoint of large∘small iff it is a disjoint
      * union of stars rooted at component minima, and THAT is locally
      * checkable — (a) no vertex appears as both a src and a dst, and
      * (b) no src carries two out-edges. (⇐: on such a star forest the
      * root is below every member, so large-star re-emits each (v, r)
      * and small-star re-emits the same — both identities, shown in
      * the fixpoint-shape note at the bottom. ⇒: a fixpoint violating
      * (a) holds (a→b),(b→c) and the note's contradiction kills it; a
      * fixpoint violating (b) holds (v→m1),(v→m2) with m1 < m2 and the
      * next small-star emits the NEW edge (m2→m1) — u = v's
      * closed-neighborhood min is m1 and m2 ≤ v — so it was no
      * fixpoint.) The previous detector — two consecutive rounds with
      * equal (xor-of-hash, count) checksums — could only see a
      * fixpoint by RE-DERIVING it, paying one extra full round (two
      * more groupBy/join/distinct passes over the edge set) purely to
      * confirm; the structural probe fires in the round that PRODUCES
      * the star forest. Measured: q111 2 → 1 rounds, q139/q140's
      * mutual-kNN graph 6 → 5, identical labels (oracle + spec). Cost:
      * the probe's vertex-keyed groupBy is one narrow exchange over
      * 2|E| tagged rows where the checksum was a single scalar agg —
      * strictly cheaper than the round it deletes. It is also exact
      * where the checksum had a (negligible) hash-collision false-
      * convergence risk, and it directly verifies the no-dst-is-a-src
      * property the root extraction below RELIES on.
      */
    def isStarForest(df: DataFrame): Boolean = {
      val bad = df.select(col("src").as("x"), lit(1L).as("es"), lit(0L).as("ed"))
        .union(df.select(col("dst").as("x"), lit(0L).as("es"), lit(1L).as("ed")))
        .groupBy(col("x"))
        // edge set is distinct, so the src-tag sum counts out-edges
        .agg(sum(col("es")).as("outdeg"), max(col("ed")).as("isDst"))
        .agg(count_if(col("outdeg") > 1L ||
          (col("outdeg") > 0L && col("isDst") === 1L)))
        .head().getLong(0)
      bad == 0L
    }

    // No action over the INPUT edge set (round 21): real caller graphs
    // (raw near-dup / mutual-kNN pair frames) are never pre-contracted
    // star forests, so probing the input would be one wasted action per
    // call; an already-fixpoint input costs one (identity) round.
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
      converged = isStarForest(small)
      edges = small
    }
    // round-count diagnostic is opt-in: this is library code, and an
    // unconditional stderr print would fire for every embedding caller
    // (round-15 advice). GRAFT_CC_DEBUG=1 turns it on for forensics.
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] large/small-star converged in $rounds rounds")
    // Fixpoint shape (round 21 — relied on, so proved here): converged
    // now means the structural probe verified the edge set IS a
    // disjoint union of stars rooted at component minima (and any
    // checksum-stable set is necessarily one). Sketch for the
    // stable-set direction: small-star output always has
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
