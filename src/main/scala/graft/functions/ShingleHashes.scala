package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text)` — the distinct xxhash64 values of a document's
  * word n-gram shingles, in one pass.
  *
  * Semantically identical to
  * `array_distinct(transform(shingles(split(text,' '), n), s -> xxhash64(s)))`
  * but the higher-order-function formulation interprets three nested
  * lambdas per document (split → slice/concat per shingle → hash per
  * shingle), rebuilding every shingle string — the single hottest
  * always-interpreted path in the dedup pipeline and the last source of
  * JIT-timing-dependent run-to-run variance. This expression is one
  * scalac-compiled loop; `doGenCode` emits a single static call, so the
  * surrounding stage stays inside whole-stage codegen.
  *
  * Hash contract: each shingle hashes exactly like the SQL
  * `xxhash64('t1 t2 … tn')` (seed 42 over the UTF-8 bytes of the
  * space-joined tokens), so signatures and hashed shingle sets are
  * unchanged from the built-in formulation.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHashes.hashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleHashes.hashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Distinct xxhash64 of each n-gram "t_i t_(i+1) … t_(i+n-1)". */
  def hashes(text: UTF8String, n: Int): Array[Long] = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < n) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long](tokens.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }

  /** Column-API face; the function is injected via
    * `spark.sql.extensions=graft.GraftExtensions` (see VecDot.dot). */
  def of(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("shingle_hashes", text)
}
