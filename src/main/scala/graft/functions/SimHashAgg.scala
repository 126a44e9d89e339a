package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `simhash_sig(md5hex, count)` — Charikar SimHash over count-weighted
  * token hashes: per bit j (1-based hex digit of the md5), the buffer
  * accumulates `count · (digit ≥ 8 ? +1 : −1)`; the final signature sets
  * bit j when the accumulated weight is positive. Arithmetic is identical
  * to the DuckDB oracle's 32 conditional SUMs (see q37's SQL).
  *
  * Same rationale as [[MinHashAgg]]: the 32-conditional-sum column
  * formulation generates a huge update method hostage to JIT compile-queue
  * luck; this update loop is ordinary scalac bytecode with a 32-long
  * buffer.
  */
case class SimHashAgg(
    hash: Expression,
    count: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hash, count)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == StringType && count.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires (STRING md5 hex, BIGINT count), got " +
        s"(${hash.dataType.simpleString}, ${count.dataType.simpleString})")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    val c = count.eval(input)
    if (h != null && c != null) {
      val hex = h.asInstanceOf[UTF8String].toString
      val n = c.asInstanceOf[Long]
      var j = 0
      while (j < bits && j < hex.length) {
        // high bit of hex digit j: digits 8..f
        val d = Character.digit(hex.charAt(j), 16)
        buf(j) += (if (d >= 8) n else -n)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < bits) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      if (buf(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hash = newChildren(0), count = newChildren(1))
}

object SimHashAgg {
  def apply(hash: Expression, count: Expression): SimHashAgg =
    SimHashAgg(hash, count, graft.llm.TextOps.SimhashBits)

  def sig(hash: org.apache.spark.sql.Column, count: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("simhash_sig", hash, count)
}
