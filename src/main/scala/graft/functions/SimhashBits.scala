package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native SimHash majority vote: given per-feature hash values
  * (`array<bigint>`) and a literal bit width n ≤ 63, returns the
  * fingerprint whose bit b is set iff a STRICT majority of the feature
  * hashes have bit b set — the exact semantics of the
  * `sum over b of CASE WHEN 2*size(filter(vals, v -> (v div 2^b)%2=1)) >
  * size(vals) ...` expression chain it replaces (q36/q42), including the
  * denominator counting null elements while the numerator skips them.
  *
  * Why native: the HOF formulation makes n separate interpreted
  * `filter` passes (each allocating a filtered array) per row — O(n·|vals|)
  * lambda dispatches. This kernel is one two-level primitive loop in
  * generated Java: O(n·|vals|) AND-shifts with zero allocation, inside
  * whole-stage codegen. Same asymptotics, ~none of the constants.
  */
case class SimhashBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) => right match {
      case Literal(n: Int, IntegerType) if n >= 1 && n <= 63 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "simhash_bits nbits must be an INT literal in [1, 63]")
    }
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_bits"

  private lazy val nbits: Int = right.eval().asInstanceOf[Int]

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vals = a.asInstanceOf[ArrayData]
    val n = vals.numElements()
    val counts = new Array[Int](nbits)
    var i = 0
    while (i < n) {
      if (!vals.isNullAt(i)) {
        val v = vals.getLong(i)
        var bit = 0
        while (bit < nbits) {
          counts(bit) += ((v >>> bit) & 1L).toInt
          bit += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < nbits) {
      if (2 * counts(bit) > n) fp |= (1L << bit)
      bit += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vals, _) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      val v = ctx.freshName("v")
      val counts = ctx.freshName("counts")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $vals.numElements();
         |int[] $counts = new int[$nbits];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$vals.isNullAt($i)) {
         |    long $v = $vals.getLong($i);
         |    for (int $bit = 0; $bit < $nbits; $bit++) {
         |      $counts[$bit] += (int) (($v >>> $bit) & 1L);
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $bit = 0; $bit < $nbits; $bit++) {
         |  if (2 * $counts[$bit] > $n) $fp |= (1L << $bit);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimhashBits =
    copy(left = newLeft, right = newRight)
}
