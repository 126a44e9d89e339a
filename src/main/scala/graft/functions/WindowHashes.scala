package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `window_hashes(text, n)` — the polynomial ROLLING hash of every
  * overlapping n-token window of a document, one array element per start
  * position, in O(tokens) total work.
  *
  * This is the anchor generator for variable-length repeated-substring
  * dedup ([[graft.llm.Dedup.repeatedSpans]]): every window of every
  * position must be fingerprinted, and the naive per-position formulation
  * (`transform(sequence(...), p -> md5(array_join(slice(toks, p, n))))`)
  * re-reads n tokens per position — O(tokens × n) bytes hashed, a 16-64×
  * constant on the hottest map pass of the pipeline. The rolling form pays
  * one xxhash64 per TOKEN, then each successive window hash is a wrap-around
  * update `h' = (h − t_out·B^(n−1))·B + t_in`.
  *
  * Hash contract: equal token windows always produce equal hashes (the
  * polynomial is a deterministic function of the token sequence), so a
  * downstream GROUP BY on these anchors has RECALL 1 for exact repeats.
  * 64-bit wrap collisions between unequal windows are possible and
  * expected: callers must re-verify candidate groups against exact window
  * content (md5), which also makes the kernel's exact constants
  * irrelevant to any oracle — only the recall-1 property is load-bearing.
  */
case class WindowHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"window_hashes requires a STRING argument, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(WindowHashes.hashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.WindowHashes.hashes($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {

  /** Odd multiplier (golden-ratio constant) — odd keeps ·B a bijection on
    * Z/2^64, so leading-term cancellation in the rolling update is exact. */
  private val B = 0x9E3779B97F4A7C15L

  /** Rolling hash of window starting at each 0-based position `p` in
    * 0..tokens−n; empty when the document is shorter than n tokens. */
  def hashes(text: UTF8String, n: Int): Array[Long] = {
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < n) return Array.emptyLongArray
    val th = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      th(i) = XxHash64Function.hash(
        UTF8String.fromString(tokens(i)), StringType, 42L)
      i += 1
    }
    var bn = 1L // B^(n-1), the weight of the outgoing leading token
    i = 0
    while (i < n - 1) { bn *= B; i += 1 }
    val out = new Array[Long](tokens.length - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + th(i); i += 1 }
    out(0) = h
    var p = 1
    while (p <= tokens.length - n) {
      h = (h - th(p - 1) * bn) * B + th(p + n - 1)
      out(p) = h
      p += 1
    }
    out
  }

  /** Column-API face; registered via GraftExtensions like the other
    * kernels (the n argument must be a foldable integer literal). */
  def of(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function(
      "window_hashes", text, org.apache.spark.sql.functions.lit(n))
}
