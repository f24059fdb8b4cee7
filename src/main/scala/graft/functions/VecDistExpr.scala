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
