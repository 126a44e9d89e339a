package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.Column

/** `vec_dot(a, b)` — dot product of two float vectors, accumulated
  * left-to-right in doubles.
  *
  * This is the one place the LLM-pipeline surface genuinely needs a custom
  * Catalyst `Expression`: Spark's higher-order array functions
  * (`zip_with` + `aggregate`) express the same semantics but evaluate on the
  * interpreted path (no `doGenCode`), which measured ~50× slower on the
  * MinHash workload — unacceptable when ANN scoring is the per-row hot loop
  * over 100 TB. `doGenCode` emits a tight primitive loop that whole-stage
  * codegen inlines; no boxing, no closures.
  *
  * Determinism: strict sequential accumulation (index 0 → n−1) in doubles,
  * so results are bit-identical to any engine that does the same — the
  * DuckDB oracle's `list_sum(list_transform(...))` twin included.
  * Null-intolerant on the array arguments; null *elements* are read as 0.0
  * (embeddings carry none).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
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
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {

  /** Column-API face of the expression. The function is injected by
    * `spark.sql.extensions=graft.GraftExtensions` (the supported,
    * version-stable path — set by graft.Sessions; any other session must
    * add the same extension at build time). Spark 4 exposes no public
    * Expression→Column constructor, so the registry + `call_function`
    * pair IS the sanctioned route for custom expressions. */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
}
