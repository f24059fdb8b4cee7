package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Elementwise sum of fixed-width `Array[Long]` vectors as a typed
  * `Aggregator` — the exact-integer reduction under the fixed-point
  * k-means update (ops/KMeans.scala) and any future PQ codebook train.
  *
  * Why integer vectors: a distributed mean of FLOATS is not reproducible
  * (IEEE addition is non-associative, and partition order is not
  * deterministic on a real cluster), so the k-means pipeline quantizes
  * coordinates to 2^24-scaled integers first. Long addition IS
  * associative+commutative, so this aggregator yields the bit-identical
  * centroid sum under ANY partitioning — the property that lets a DuckDB
  * oracle (and a 100 TB re-run) reproduce the training exactly.
  *
  * Scale shape: pure monoid ⇒ map-side partial aggregation; each
  * partition reduces its members to one dim·8-byte buffer before the
  * shuffle, so a k-cluster update moves O(partitions·k·dim) bytes —
  * constant in the corpus size.
  */
final class VecSumLong(dim: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](dim)

  override def reduce(buf: Array[Long], x: Array[Long]): Array[Long] = {
    require(x.length == dim, s"vector length ${x.length} != $dim")
    var i = 0
    while (i < dim) { buf(i) += x(i); i += 1 }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
