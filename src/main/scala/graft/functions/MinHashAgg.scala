package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `minhash_sig(h)` — aggregate a column of 32-bit-masked hashes into a
  * MinHash signature: sig[k] = min over rows of (a_k·h + b_k) mod p, for
  * k < numHashes (Carter–Wegman family over the Mersenne prime 2³¹−1; the
  * constants live in [[graft.llm.Dedup]]).
  *
  * Why a TypedImperativeAggregate instead of `numHashes` separate `min`
  * columns: the wide formulation generates an enormous whole-stage-codegen
  * update method whose JIT compilation is at the mercy of the C1/C2 queue
  * — when 50+ queries' generated classes contend for compiler threads, the
  * method runs interpreted (~400× slower) for tens of seconds,
  * nondeterministically. This class's update loop is ordinary
  * scalac-compiled bytecode: small, immediately JIT-friendly, same speed
  * every run, and one aggregation buffer of H longs instead of H columns.
  * This is the "custom TypedImperativeAggregate for sketches" SURVEY §7.4
  * reserves custom code for.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    a: Array[Long],
    b: Array[Long],
    p: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a BIGINT input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & 0xffffffffL
      var k = 0
      while (k < numHashes) {
        val x = (h * a(k) + b(k)) % p
        if (x < buf(k)) buf(k) = x
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

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

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {

  /** Default family size — must stay in sync with graft.llm.Dedup's
    * banding (Bands × RowsPerBand). */
  val NumHashes = 64

  /** Carter–Wegman family over the Mersenne prime 2³¹−1, constants from
    * SplitMix64 — deterministic, and intermediates stay under 2⁶³ for
    * ANSI-mode arithmetic (the base hash is masked to 32 bits in update). */
  val MersennePrime: Long = (1L << 31) - 1

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val A: Array[Long] =
    (0 until NumHashes).map(k => Math.floorMod(splitmix64(k.toLong), MersennePrime - 1) + 1).toArray
  val B: Array[Long] =
    (0 until NumHashes).map(k => Math.floorMod(splitmix64(k.toLong + 0x5eed), MersennePrime)).toArray

  def apply(child: Expression): MinHashAgg =
    MinHashAgg(child, NumHashes, A, B, MersennePrime)

  /** Column-API face; the function is injected via
    * `spark.sql.extensions=graft.GraftExtensions` (see VecDot.dot). */
  def sig(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("minhash_sig", h)
}
