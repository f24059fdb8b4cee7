package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for word n-gram (shingle) construction. Top-level object →
  * static forwarders, called directly from generated Java (the
  * [[HashKernels]] pattern).
  */
object NGramKernel {

  private val Space = UTF8String.fromString(" ")

  /** Space-joined sliding n-grams of a token array: element i is
    * `arr[i] ⧺ " " ⧺ … ⧺ arr[i+n-1]`, `max(len-n+1, 0)` elements.
    * Byte-identical to the HOF chain
    * `transform(sequence(1, size(a)-n+1), i -> concat_ws(' ', a[i], …))`
    * for arrays with NO null elements (a null element: `concat`/
    * `concat_ws` would skip or poison; this kernel requires non-null
    * tokens, which `split()` output guarantees). Parity pinned by
    * FunctionPropertySpec.
    */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val res = new Array[Any](out)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < out) {
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      res(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }
}

/** `ngrams(arr, n)`: native word-shingle construction — the hot inner
  * loop of every shingle-based operator (q32/q33/q42 3-grams, q77
  * 5-grams). The HOF formulation (`transform(sequence(...))` with
  * per-gram `concat_ws`/`element_at` lambdas) runs INTERPRETED —
  * higher-order functions don't participate in whole-stage codegen —
  * and measured ~10 s of the sf0.1 corpus scan in q77; this expression
  * is one static-kernel call per row inside the codegen stage.
  * Cross-engine correctness is unchanged: output strings are
  * byte-identical to the HOF chain (property-pinned), so every DuckDB
  * oracle keeps its independent `list_transform(generate_series(...))`
  * formulation.
  */
case class NGramsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("ngrams: n must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ngrams expects (array<string>, int), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "ngrams"

  override protected def nullSafeEval(a: Any, n: Any): Any =
    NGramKernel.ngrams(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, n) =>
      s"graft.functions.NGramKernel.ngrams($a, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NGramsExpr =
    copy(left = newLeft, right = newRight)
}
