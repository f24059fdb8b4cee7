package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Static kernels for the quantized-vector distance hot paths (k-means
  * assignment, IVF routing) — generated code calls these forwarders
  * directly, the HashKernels/Html.parsePageRow pattern, so interpreted
  * eval and codegen share one implementation.
  *
  * Numeric contract (the cross-engine-exactness invariant of the whole
  * clustering family): the squared-distance fold is LEFT-TO-RIGHT from
  * +0.0 over `(double) a_i − b_i` — bit-identical to the
  * `aggregate(zip_with(...), 0D, (s,x) -> s+x)` HOF chain it replaces
  * and to DuckDB's `list_reduce(list_transform(...))` (0.0 + x == x).
  * The argmin is strict `<` scanning candidates in array order — first
  * minimum wins, which over a (cid ASC)-sorted codebook is exactly the
  * `(dist ASC, cid ASC)` tie rule of the HOF fold and the oracle's
  * ROW_NUMBER.
  */
object VecDistKernels {

  /** Σ_i ((double) a(i) − b(i))², left-to-right, over the common prefix. */
  def l2sqLD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) {
      val d = a.getLong(i).toDouble - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Argmin of l2sqLD(xq, cs(j).mu) over j in array order; returns a
    * 2-field row (d: double, c: int = cs(j).cid). Empty cs → (+Inf, −1),
    * the HOF fold's seed. */
  def l2argmin(xq: ArrayData, cs: ArrayData): InternalRow = {
    var bd = Double.PositiveInfinity
    var bc = -1
    val k = cs.numElements()
    var j = 0
    while (j < k) {
      val ct = cs.getStruct(j, 2)
      val d = l2sqLD(xq, ct.getArray(1))
      if (d < bd) { bd = d; bc = ct.getInt(0) }
      j += 1
    }
    new GenericInternalRow(Array[Any](bd, bc))
  }

  /** Σ_i v(i)·c(i), left-to-right from +0.0, null elements skipped —
    * DotProductF.nullSafeEval's exact fold (same order, same null
    * contract), shared by [[cosArgmax]] so the per-candidate cosine is
    * bit-identical to the `dot_f(v, cv) / (nrm * cn)` column the
    * exploded window form computed. */
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Argmax of dotDD(v, cs(j).cv) / (nrm * cs(j).cn) over j in array
    * order; returns a 2-field row (cid: long = cs(j).cid, cos: double =
    * the winning cosine). Tie/NaN rule replicates the
    * `row_number() OVER (ORDER BY cos DESC, cid ASC)` window it
    * replaces under Spark's double ordering: NaN sorts ABOVE +Inf,
    * NaN == NaN, −0.0 == 0.0 — so the scan keeps candidate j only when
    * its cosine is STRICTLY greater under that ordering, which over a
    * cid-sorted candidate array yields the smallest cid among the
    * maxima, exactly the window's rn = 1 row. Empty cs → (−1, NaN)
    * (callers guard; cellMembersPlan/semanticNearest filter the
    * empty-codebook corpus to the empty frame first, the inner-join
    * semantics of the window form). */
  def cosArgmax(v: ArrayData, nrm: Double, cs: ArrayData): InternalRow = {
    var best = Double.NaN
    var bc = -1L
    var has = false
    val k = cs.numElements()
    var j = 0
    while (j < k) {
      val ct = cs.getStruct(j, 3)
      val c = dotDD(v, ct.getArray(1)) / (nrm * ct.getDouble(2))
      // nan-safe strict ">" matching Spark's sort order on doubles
      val gt =
        if (java.lang.Double.isNaN(c)) !java.lang.Double.isNaN(best)
        else if (java.lang.Double.isNaN(best)) false
        else c > best
      if (!has || gt) { best = c; bc = ct.getLong(0); has = true }
      j += 1
    }
    new GenericInternalRow(Array[Any](bc, best))
  }

  /** PQ encode: for each subspace jj in 0..sub−1, the cid of the
    * codeword minimizing the left-to-right-from-+0.0 fold of
    * (x_i − mu_i)² over the jj-th dsub-slice of `vec`, codewords
    * scanned in array order within cbl[jj·k .. jj·k+k−1] with strict
    * `<` from a +Inf seed — exactly the
    * `aggregate(transform(slice(cbl, jj*k+1, k), ...),
    *  named_struct('d', Inf, 'c', -1), (acc, en) -> IF(en.d < acc.d,
    *  en, acc))` HOF chain it replaces (first minimum wins ⇒ the
    * (dist ASC, cid ASC) tie rule over the sort_array'd codebook).
    * `fromLong` selects whether vec elements are read as long (q119's
    * quantized xq, `cast(a as double) − b`) or double (q122's residual
    * r). cbl elements: struct<jj:int, cid:int, mu:array<double>>. */
  def pqEncode(vec: ArrayData, cbl: ArrayData, sub: Int, dsub: Int,
      k: Int, fromLong: Boolean): ArrayData = {
    val out = new Array[Int](sub)
    var jj = 0
    while (jj < sub) {
      var bd = Double.PositiveInfinity
      var bc = -1
      var c = 0
      while (c < k) {
        val ct = cbl.getStruct(jj * k + c, 3)
        val mu = ct.getArray(2)
        val off = jj * dsub
        val n = math.min(math.min(dsub, mu.numElements()),
          math.max(0, vec.numElements() - off))
        var s = 0.0d
        var i = 0
        while (i < n) {
          val a = if (fromLong) vec.getLong(off + i).toDouble
                  else vec.getDouble(off + i)
          val d = a - mu.getDouble(i)
          s += d * d
          i += 1
        }
        if (s < bd) { bd = s; bc = ct.getInt(1) }
        c += 1
      }
      out(jj) = bc
      jj += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC lookup sum: Σ_jj qdt(jj)(codes(jj)), jj ascending,
    * left-to-right from +0.0 — exactly
    * `aggregate(sequence(0, sub-1), 0D, (s, jj) -> s +
    *  element_at(element_at(qdt, jj+1), element_at(codes, jj+1)+1))`. */
  def pqAdc(codes: ArrayData, qdt: ArrayData): Double = {
    var s = 0.0d
    var jj = 0
    val n = codes.numElements()
    while (jj < n) {
      s += qdt.getArray(jj).getDouble(codes.getInt(jj))
      jj += 1
    }
    s
  }
}

/** `l2sq_ld(array<bigint>, array<double>): double` — native squared-L2
  * between a 2^24-quantized coordinate vector and a double centroid
  * (ops/KMeans distExpr's semantics, compiled). Null array → null; the
  * callers' arrays are dense and equal-length (KMeans.quantize output
  * vs centroid means). */
case class L2SqLDExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"l2sq_ld expects (array<bigint>, array<double>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_ld"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDistKernels.l2sqLD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.VecDistKernels.l2sqLD($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLDExpr =
    copy(left = newLeft, right = newRight)
}

/** `l2_argmin(xq: array<bigint>, cs: array<struct<cid:int, mu:array<double>>>)
  * : struct<d:double, c:int>` — the whole k-means assignment step as one
  * compiled expression: nearest codebook entry by squared L2, candidates
  * scanned in array order (a cid-sorted codebook ⇒ the (dist ASC, cid
  * ASC) tie rule). Replaces the interpreted
  * `aggregate(transform(cs, ...), named_struct(...), IF(...))` HOF chain
  * that dominated q117/q122 bench cost (~0.4 s per corpus×k×dim scan at
  * sf0.1, ×3 Lloyd rounds). */
case class L2ArgminExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _),
          ArrayType(StructType(Array(
            StructField(_, IntegerType, _, _),
            StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"l2_argmin expects (array<bigint>, array<struct<int, array<double>>>), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("c", IntegerType, nullable = false)))
  override def prettyName: String = "l2_argmin"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDistKernels.l2argmin(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.VecDistKernels.l2argmin($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2ArgminExpr =
    copy(left = newLeft, right = newRight)
}

/** `cos_argmax(v: array<double>, nrm: double,
  * cs: array<struct<cid:bigint, cv:array<double>, cn:double>>)
  * : struct<cid:bigint, cos:double>` — the whole cosine
  * codebook-assignment step as one compiled expression: the cid of the
  * candidate maximizing `dot(v, cv) / (nrm · cn)` plus that winning
  * cosine, candidates scanned in array order with a NaN-safe strict
  * comparison (a cid-sorted codebook ⇒ the (cos DESC, cid ASC) tie
  * rule — see [[VecDistKernels.cosArgmax]]). Replaces the exploded
  * broadcast-join + row_number-window + join-back assignment stage of
  * cellMembersPlan (q87/q139/q140), semanticNearest (q126/Curate 5b)
  * and q60 with a single map-side projection over the embedding scan:
  * the K dot products per row are the same flops, but the window's
  * corpus×K exchange+sort and the corpus⋈corpus assignment join are
  * gone entirely. */
case class CosArgmaxExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _),
              StructField(_, DoubleType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"cos_argmax expects (array<double>, double, " +
          s"array<struct<bigint, array<double>, double>>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cid", LongType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def prettyName: String = "cos_argmax"

  override protected def nullSafeEval(v: Any, nrm: Any, cs: Any): Any =
    VecDistKernels.cosArgmax(v.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Double], cs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm, cs) =>
      s"${ev.value} = graft.functions.VecDistKernels.cosArgmax($v, $nrm, $cs);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CosArgmaxExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `pq_encode(vec: array<bigint>|array<double>,
  * cbl: array<struct<jj:int, cid:int, mu:array<double>>>): array<int>`
  * — the whole product-quantization encode step (sub × k × dsub) as one
  * compiled expression; see [[VecDistKernels.pqEncode]] for the exact
  * fold/tie contract it shares with the interpreted
  * `transform(sequence(...), jj -> aggregate(transform(slice(...))))`
  * HOF chain it replaces on the q119/q122 corpus scans (per-row lambda
  * dispatch was the dominant encode cost, the q117 l2_argmin lesson).
  * sub/dsub/k are plan-time constants (the codebook geometry). */
case class PqEncodeExpr(left: Expression, right: Expression,
    sub: Int, dsub: Int, k: Int) extends BinaryExpression {

  private def fromLong: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType | DoubleType, _),
            ArrayType(StructType(Array(
              StructField(_, IntegerType, _, _),
              StructField(_, IntegerType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<bigint>|array<double>, " +
          s"array<struct<int, int, array<double>>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any, cb: Any): Any =
    VecDistKernels.pqEncode(v.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], sub, dsub, k, fromLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) =>
      s"${ev.value} = graft.functions.VecDistKernels.pqEncode(" +
        s"$v, $cb, $sub, $dsub, $k, $fromLong);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** `pq_adc(codes: array<int>, qdt: array<array<double>>): double` —
  * the asymmetric-distance lookup sum as one compiled expression; see
  * [[VecDistKernels.pqAdc]] for the fold contract shared with the
  * `aggregate(sequence(...), 0D, ...)` chain it replaces on the
  * q119/q122 scored frames (corpus × probing-queries rows, 8
  * interpreted element_at dispatches per row before). */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (array<int>, array<array<double>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(c: Any, q: Any): Any =
    VecDistKernels.pqAdc(c.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.functions.VecDistKernels.pqAdc($c, $q);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
