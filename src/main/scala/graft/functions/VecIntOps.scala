package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.Column

/** Integer vector kernels for the scaled-integer (micro-unit) ANN space —
  * the [[VecDot]] rationale applied to the Lloyd/PQ hot loops: Spark's
  * `aggregate(zip_with(...))` expresses the same arithmetic but evaluates
  * on the interpreted path, and in a k-way assignment scan that pairwise
  * kernel IS the per-row work (corpus × k centroids × dim multiplies).
  * Both kernels accumulate in longs exactly as the HOF formulation does —
  * left-to-right, wrap-on-overflow — so on EQUAL-LENGTH, NULL-FREE arrays
  * (which is all the quantized relations ever produce: fixed `dim`/`m`
  * vectors built by `transform` over literals) swapping them in changes no
  * result bit and the DuckDB oracles are untouched. The equivalence does
  * NOT extend to ragged or null-carrying inputs: `aggregate(zip_with(...))`
  * null-pads the shorter array and returns NULL on any null element,
  * whereas these kernels sum the common prefix and read null elements as 0
  * — a caller with such inputs must use the HOF form (or pre-clean).
  */
private[functions] trait LongArrayBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
}

/** `vec_l2i(a, b)` = Σ (a_i − b_i)² over the common prefix — the exact
  * integer squared L2 distance every Lloyd assignment/encode step ranks
  * by. */
case class VecL2I(left: Expression, right: Expression) extends LongArrayBinary {
  override def prettyName: String = "vec_l2i"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $d = $x.getLong($i) - $y.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2I =
    copy(left = newLeft, right = newRight)
}

/** `vec_doti(a, b)` = Σ a_i·b_i over the common prefix — the exact
  * integer inner product of the PQ/ADC lookup-table build. */
case class VecDotI(left: Expression, right: Expression) extends LongArrayBinary {
  override def prettyName: String = "vec_doti"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI =
    copy(left = newLeft, right = newRight)
}

object VecIntOps {
  /** Column faces, routed through the extension-injected registry (see
    * [[VecDot.dot]] for why `call_function` is the sanctioned path). */
  def l2(a: Column, b: Column): Column = call_function("vec_l2i", a, b)
  def dot(a: Column, b: Column): Column = call_function("vec_doti", a, b)
}
