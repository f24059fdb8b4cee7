package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 55(1), 2005) as a typed `Aggregator` — the frequency-estimation
  * sibling of [[KMinDistinctAggregator]]'s cardinality sketch.
  *
  * The buffer is a fixed d×w counter matrix flattened to one
  * `Array[Long]` (d·w·8 bytes — 16 KiB at the default 4×512,
  * independent of stream length). Each input row carries its d
  * PRE-COMPUTED counter indices (row-offset included), produced by an
  * md5-derived SQL expression so the hash placement is engine-exact and
  * a DuckDB oracle can rebuild the identical matrix with a GROUP BY.
  *
  * Why this is the 100 TB shape: counters are pure sums, so the
  * aggregator gets map-side partial aggregation (each partition reduces
  * to one 16 KiB matrix before the shuffle — O(partitions·d·w) bytes
  * move, never O(tokens)), merge is elementwise add (the sketch is a
  * commutative monoid — also exactly what a streaming state store or a
  * cross-day union needs), and the estimate
  * `min_i buf(i·w + h_i(t))` overestimates true counts by at most
  * ε·N (ε = e/w) with probability 1−e^−d, never underestimates.
  * Unlike Misra-Gries/SpaceSaving summaries, the counter matrix is
  * ORDER-INDEPENDENT — the same multiset of inputs yields the same
  * matrix under any partitioning — which is what makes cross-engine
  * verification (and deterministic re-runs at scale) possible.
  */
final class CmsAggregator(d: Int, w: Int)
    extends Aggregator[Seq[Int], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], idxs: Seq[Int]): Array[Long] = {
    idxs.foreach(j => buf(j) += 1L)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
