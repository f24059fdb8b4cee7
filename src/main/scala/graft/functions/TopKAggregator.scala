package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored item inside the top-k buffer. */
final case class Scored(key: Long, score: Double)

/** Bounded-memory per-group top-k as a typed `Aggregator[IN, BUF, OUT]`
  * (the custom-UDAF surface SURVEY.md §2.6 kept in reserve) — the
  * scale-correct alternative to `row_number() OVER (PARTITION BY g ORDER
  * BY s) <= k` for top-k-per-group:
  *
  *  - the window form shuffles EVERY row to its group's partition and
  *    sorts there — O(rows) shuffle, O(rows log rows) sort;
  *  - an Aggregator gets map-side partial aggregation: each input
  *    partition reduces to at most k rows per group BEFORE the shuffle,
  *    so only O(groups × k × partitions) rows move, and merge is a
  *    k-bounded list merge.
  *
  * Ordering is total and deterministic: score DESC, key ASC (tie-break),
  * so results are stable across partitionings and match a
  * `row_number`-based oracle exactly.
  *
  * The buffer is a k-bounded sorted Seq — insertion by sort-take is
  * O(k log k) with tiny constants for the k this engine uses (k ≤ 100);
  * swap in a bounded heap for large k, same contract.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.key))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    // once the buffer holds k items, anything ordering at/after the
    // current k-th can neither enter nor displace — O(1) reject for
    // the overwhelming share of rows (KMinDistinctAggregator's fast
    // path, round 21: the unconditional sort-take was O(k log k) +
    // a fresh Seq PER INPUT ROW, measured 2.99 → 8.31 s on q122's
    // k = 50 shortlist at sf1 before this guard). The kept inserts
    // produce the identical sorted top-k.
    if (buf.length >= k && ord.compare(a, buf.last) >= 0) buf
    else (buf :+ a).sorted(ord).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

/** The k smallest DISTINCT longs per group — the KMV sketch's collection
  * step (q63) as a bounded-memory typed Aggregator. Same scale argument
  * as [[TopKAggregator]] (each map partition reduces to ≤ k values per
  * group before the shuffle; merge is a k-bounded distinct-merge), plus
  * the KMV-specific property that the buffer IS the sketch: mergeable
  * (union = merge of buffers), and when |buffer| < k after all input the
  * sketch holds the whole distinct set (the degenerate exact case).
  */
final class KMinDistinctAggregator(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    // once the buffer holds k minima, anything >= the current k-th
    // minimum can neither enter nor displace — O(1) reject for the
    // overwhelming share of rows on uniform-hash input, which is what
    // lets the UN-deduplicated stream feed this directly (q97)
    if (buf.length >= k && x >= buf.last) buf
    else if (buf.contains(x)) buf
    else ((buf :+ x).sorted.take(k))

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  override def finish(reduction: Seq[Long]): Seq[Long] = reduction

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
