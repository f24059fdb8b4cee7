package graft.queries

import graft.{Q, Tables => T}
import org.apache.spark.sql.functions._

/** Embedding-space CLUSTERING — the trainer behind the ANN family's
  * codebooks. q60's IVF assigns against a fixed stand-in codebook and
  * documents "at scale the codebook comes from a sampled k-means job";
  * q117 IS that job, end-to-end verifiable.
  *
  * Shared discipline with the rest of the registry: engine-exact
  * arithmetic (fixed-point integer accumulation, pinned-order double
  * folds), keyed/monoid shuffles only, zero driver-side data movement.
  */
object ClusterOps {

  private val embDim = 64
  private val kClusters = 8
  private val lloydIters = 3

  // The DuckDB twin of ops/KMeans.distExpr: same subtraction, same
  // square, same fold order over dims 1..64. Spark's fold seeds with 0D;
  // 0.0 + d == d exactly for the non-negative squares, so the two folds
  // are bit-identical.
  private def duckDist(xq: String, mu: String): String =
    s"""list_reduce(list_transform(generate_series(1, $embDim),
       |            i -> (CAST($xq[i] AS DOUBLE) - $mu[i]) * (CAST($xq[i] AS DOUBLE) - $mu[i])),
       |           (x, y) -> x + y)""".stripMargin

  private def duckIter(t: Int): String = {
    val prev = s"c${t - 1}"
    s"""      a$t AS (
       |        SELECT vec_id, cid, dist, xq FROM (
       |          SELECT d.*, ROW_NUMBER() OVER (PARTITION BY vec_id
       |                        ORDER BY dist ASC, cid ASC) rn
       |          FROM (
       |            SELECT e.vec_id, c.cid, e.xq,
       |              ${duckDist("e.xq", "c.mu")} AS dist
       |            FROM e CROSS JOIN $prev c) d) WHERE rn = 1),
       |      s$t AS (
       |        SELECT cid, i, SUM(xq[i]) AS sx, COUNT(*) AS cnt
       |        FROM a$t CROSS JOIN g GROUP BY cid, i),
       |      c$t AS (
       |        SELECT p.cid,
       |          CASE WHEN COUNT(s.i) = 0 THEN any_value(p.mu)
       |               ELSE list(CAST(s.sx AS DOUBLE) / CAST(s.cnt AS DOUBLE) ORDER BY s.i)
       |          END AS mu
       |        FROM $prev p LEFT JOIN s$t s ON s.cid = p.cid GROUP BY p.cid)""".stripMargin
  }

  // -------------------------------------------------------------------
  // q117 — Lloyd's k-means codebook training (fixed-point, exact)
  // -------------------------------------------------------------------

  /** Three full Lloyd rounds, k=8, deterministic init (vec_id < k), over
    * 2^24-quantized coordinates (ops/KMeans.scala for the determinism
    * contract and the constant-shuffle scale argument). Output is the
    * per-cluster training summary of the FINAL round: member count,
    * exact integer dim-0 centroid sum (the reproducibility witness — it
    * must match DuckDB to the last bit or the whole reduction is
    * order-dependent), the dim-0 mean, and the min/max squared distance
    * of the members to the centroid that claimed them.
    *
    * Scale: per round the corpus is never shuffled — assignment is a
    * map-side fold against a broadcast k·dim array, the update's monoid
    * partial-agg moves O(partitions·k·dim) bytes. 100 TB cost = iters
    * linear scans, shuffle constant.
    */
  val q117KmeansLloyd = Q(
    "q117_kmeans_lloyd",
    (s, dir) => {
      import graft.ops.KMeans
      val e = T.embeddings(s, dir)
        .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))
        .persist()
      val (assigned, _) = KMeans.run(e, kClusters, embDim, lloydIters)
      val vsum = udaf(new graft.functions.VecSumLong(embDim))
      assigned.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_members"),
          vsum(col("xq")).as("sv"),
          min(col("dist")).as("min_dist"),
          max(col("dist")).as("max_dist"))
        .select(col("cid").as("cluster_id"),
          col("n_members"),
          element_at(col("sv"), 1).as("sum_q0"),
          (element_at(col("sv"), 1).cast("double") /
            col("n_members").cast("double")).as("mu0"),
          col("min_dist"), col("max_dist"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS xq
        FROM embeddings),
      g AS (SELECT unnest(generate_series(1, $embDim)) AS i),
      c0 AS (
        SELECT CAST(vec_id AS INTEGER) AS cid,
          list_transform(xq, q -> CAST(q AS DOUBLE)) AS mu
        FROM e WHERE vec_id < $kClusters),
${(1 to lloydIters).map(duckIter).mkString(",\n")}
      SELECT cid AS cluster_id,
        CAST(COUNT(*) AS BIGINT) AS n_members,
        CAST(SUM(xq[1]) AS BIGINT) AS sum_q0,
        CAST(SUM(xq[1]) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu0,
        MIN(dist) AS min_dist,
        MAX(dist) AS max_dist
      FROM a$lloydIters GROUP BY cid ORDER BY cluster_id""".stripMargin),
    "distributed Lloyd k-means codebook training: 2^24 fixed-point coords make the centroid reduction associative (bit-reproducible under any partitioning); assignment = map-side fold vs broadcast codebook, update = monoid partial agg — per-iteration shuffle O(partitions*k*dim), constant in corpus size")

  // -------------------------------------------------------------------
  // q119 — product-quantization ADC search
  // -------------------------------------------------------------------

  private val pqSub = 8 // subspaces
  private val pqDsub = embDim / pqSub // dims per subspace
  private val pqK = 8 // codewords per subspace

  /** Product quantization with asymmetric distance computation (Jégou,
    * Douze & Schmid, TPAMI'11 §IV) — the memory end of the similarity
    * family: q34 exact / q43 LSH / q60 IVF / q105 int8 / q108 two-stage
    * reduce SCAN cost; PQ reduces RESIDENCY. The 64-dim vector (256 B
    * as float) is encoded as 8 codeword ids (8 B — a 32× compression),
    * one per 8-dim subspace, and query-to-vector distance is
    * approximated by table lookups: per query precompute the 8×8 table
    * of (sub-query ↔ codeword) distances, then any corpus vector's
    * approximate distance is the sum of 8 table entries — no float
    * vector ever touched at scan time.
    *
    * Codebooks here are the sub-vectors of vecs 0–7 — the same
    * data-sampled stand-in as q60's coarse centroids; the TRAINED
    * codebook is q117's k-means applied per subspace (PqSpec pins that
    * composition and that training strictly reduces distortion).
    *
    * Determinism: every distance is the pinned 8-dim fold; encode
    * argmin is (dist ASC, cid ASC); the ADC sum folds subspaces in
    * ascending order — engine-identical end to end, like q117.
    *
    * Scale shape: codebook = 64 rows → one broadcast; encode is a
    * map-side fold per corpus row (no shuffle); the scored frame is
    * corpus×queries with only (id, 8 codes) per row, and the top-k
    * window shuffles candidate ids, never vectors. At 100 TB the
    * PQ-coded corpus is the only thing resident (8 B/vec), exactly why
    * IVF-PQ is the standard billion-vector layout.
    */
  val q119PqAdc = Q(
    "q119_pq_adc",
    (s, dir) => {
      import graft.ops.KMeans
      import org.apache.spark.sql.expressions.Window
      val e = T.embeddings(s, dir)
        .select(col("vec_id"), KMeans.quantize(col("embedding")).as("xq"))
        .persist()
      // flat codebook, sorted by (subspace, codeword id): 64 rows → 1
      val cbl = e.filter(col("vec_id") < pqK)
        .select(col("vec_id").cast("int").as("cid"),
          expr(s"""posexplode(transform(sequence(0, ${pqSub - 1}),
                   jj -> transform(slice(xq, jj * $pqDsub + 1, $pqDsub),
                                   q -> cast(q as double))))""")
            .as(Seq("jj", "mu")))
        .agg(sort_array(collect_list(struct(col("jj"), col("cid"), col("mu"))))
          .as("cbl"))
      val subDist = (vec: String, ct: String) =>
        s"""aggregate(zip_with(slice($vec, jj * $pqDsub + 1, $pqDsub), $ct.mu,
           |  (a, b) -> (cast(a as double) - b) * (cast(a as double) - b)),
           |  0D, (s, x) -> s + x)""".stripMargin
      // encode: 8 codeword ids per corpus vector, map-side only
      val coded = e.join(broadcast(cbl))
        .select(col("vec_id"), expr(s"""
          transform(sequence(0, ${pqSub - 1}), jj ->
            aggregate(
              transform(slice(cbl, jj * $pqK + 1, $pqK), ct -> named_struct(
                'd', ${subDist("xq", "ct")},
                'c', ct.cid)),
              named_struct('d', cast('Infinity' as double), 'c', -1),
              (acc, en) -> IF(en.d < acc.d, en, acc),
              acc -> acc.c))""").as("codes"))
      // per-query distance tables: qdt[jj][c] = dist(sub_jj(q), cb[jj][c])
      val queries = e.filter(col("vec_id") < 10)
        .join(broadcast(cbl))
        .select(col("vec_id").as("query_id"), expr(s"""
          transform(sequence(0, ${pqSub - 1}), jj ->
            transform(slice(cbl, jj * $pqK + 1, $pqK), ct ->
              ${subDist("xq", "ct")}))""").as("qdt"))
      val scored = coded.join(broadcast(queries),
          col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          expr(s"""aggregate(sequence(0, ${pqSub - 1}), 0D, (s, jj) ->
            s + element_at(element_at(qdt, jj + 1),
                           element_at(codes, jj + 1) + 1))""").as("adist"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("adist"), col("neighbor_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"), col("adist"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH e AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS xq
        FROM embeddings),
      g AS (SELECT unnest(generate_series(0, ${pqSub - 1})) AS jj),
      cbsub AS (
        SELECT CAST(cb.vec_id AS INTEGER) AS cid, g.jj,
          list_transform(cb.xq[g.jj * $pqDsub + 1 : g.jj * $pqDsub + $pqDsub],
            q -> CAST(q AS DOUBLE)) AS mu
        FROM e cb CROSS JOIN g WHERE cb.vec_id < $pqK),
      dists AS (
        SELECT e.vec_id, c.jj, c.cid,
          list_reduce(list_transform(generate_series(1, $pqDsub),
            i -> (CAST(e.xq[c.jj * $pqDsub + i] AS DOUBLE) - c.mu[i])
               * (CAST(e.xq[c.jj * $pqDsub + i] AS DOUBLE) - c.mu[i])),
            (x, y) -> x + y) AS dist
        FROM e CROSS JOIN cbsub c),
      codes AS (
        SELECT vec_id, jj, cid AS code FROM (
          SELECT vec_id, jj, cid,
            ROW_NUMBER() OVER (PARTITION BY vec_id, jj
                               ORDER BY dist ASC, cid ASC) rn
          FROM dists) WHERE rn = 1),
      dtab AS (
        SELECT vec_id AS query_id, jj, cid, dist
        FROM dists WHERE vec_id < 10),
      adc AS (
        SELECT d.query_id, c.vec_id AS neighbor_id,
          list_reduce(list(d.dist ORDER BY d.jj), (x, y) -> x + y) AS adist
        FROM codes c JOIN dtab d ON d.jj = c.jj AND d.cid = c.code
        WHERE c.vec_id <> d.query_id
        GROUP BY d.query_id, c.vec_id),
      r AS (
        SELECT query_id, neighbor_id, adist,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY adist ASC, neighbor_id ASC) AS INTEGER) AS rank
        FROM adc)
      SELECT query_id, rank, neighbor_id, adist FROM r
      WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "product-quantization ADC search: 64-dim vector -> 8 codeword bytes (32x residency cut), per-query 8x8 distance table, approximate distance = 8 pinned-order lookups — encode is a map-side broadcast fold, the scan never touches a float vector; codebook training = q117's k-means per subspace (PqSpec)")

  val all: Seq[Q] = Seq(q117KmeansLloyd, q119PqAdc)
}
