package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native dot product over two numeric array columns:
 * `vec_dot(a, b) -> double`.
 *
 * Why an Expression: Catalyst's higher-order functions (`zip_with` +
 * `aggregate`) are INTERPRETED — every pair evaluated in the cosine joins
 * pays lambda dispatch and an intermediate product array per row. This
 * expression is a tight primitive loop over the two `ArrayData`, emitted
 * as a static call from `doGenCode` so the hosting projection stays inside
 * WholeStageCodegen (same pattern as [[TagEnvoMentions]]).
 *
 * Bit-parity contract (the DuckDB oracles depend on it): the result is the
 * EXACT left fold the HOF shape computed —
 * `((0.0 + a0·b0) + a1·b1) + …` with each element cast to double before
 * the multiply — so swapping the implementation changes no query output:
 *  - any NULL element → NULL (the HOF's `acc + NULL` propagation);
 *  - length mismatch → NULL (`zip_with` pads with NULL → NULL product);
 *  - either array NULL → NULL (BinaryExpression null-intolerance).
 *
 * Element types: each side may independently be any numeric array the HOF
 * shape's `cast("double")` accepted — float (embeddings/features), double
 * (`typedlit` literals), int, or long.
 */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def elemCode(e: Expression): Int = e.dataType match {
    case ArrayType(DoubleType, _) => VecDot.ElemDouble
    case ArrayType(FloatType, _) => VecDot.ElemFloat
    case ArrayType(IntegerType, _) => VecDot.ElemInt
    case ArrayType(LongType, _) => VecDot.ElemLong
    case other => throw new IllegalArgumentException(
      s"vec_dot needs numeric array inputs, got $other")
  }

  @transient private lazy val leftCode = elemCode(left)
  @transient private lazy val rightCode = elemCode(right)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs numeric array inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], leftCode,
      b.asInstanceOf[ArrayData], rightCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lc = leftCode
    val rc = rightCode
    // compute() returns java.lang.Double (null on mismatch/null element) —
    // unbox behind a null check so ev.isNull stays accurate
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dot")
      s"""java.lang.Double $boxed = graft.functions.VecDot.compute($a, $lc, $b, $rc);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

object VecDot {

  final val ElemDouble = 0
  final val ElemFloat = 1
  final val ElemInt = 2
  final val ElemLong = 3

  /** Shared interpreted/codegen body (static forwarder for generated Java).
    * Returns null (boxed) exactly when the HOF shape returned NULL. */
  def compute(a: ArrayData, aCode: Int, b: ArrayData, bCode: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, aCode, i) * elem(b, bCode, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private def elem(arr: ArrayData, code: Int, i: Int): Double = code match {
    case ElemDouble => arr.getDouble(i)
    case ElemFloat => arr.getFloat(i).toDouble
    case ElemInt => arr.getInt(i).toDouble
    case _ => arr.getLong(i).toDouble
  }
}
