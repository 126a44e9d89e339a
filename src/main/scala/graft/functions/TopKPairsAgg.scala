package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_pairs(neg, id, k)` — aggregate (neg, id) long pairs into the k
  * lexicographically-smallest pairs, ascending: bit-for-bit the result of
  * `slice(array_sort(collect_list(struct(neg, id))), 1, k)`, in O(k)
  * aggregation state instead of O(group).
  *
  * Why it exists (round 10): the two-stage top-k reducer
  * ([[graft.llm.Ann.topKPerKey]]) used the collect_list formulation for
  * its first stage. Correct — but collect_list's partial buffers hold the
  * ENTIRE group before the slice, so state grows with the corpus: at the
  * 100× scale audit the q198 kNN graph put ~10⁹ pairs into aggregation
  * buffers and spilled 27 GB before being killed. This kernel IS the
  * bounded-state contract the reducer always claimed: each partial holds
  * at most k pairs, merges are k-way list merges, and the shuffled
  * partial rows shrink from O(group) arrays to k-entry arrays. Same
  * fix-shape as the q183 stream fold (VERDICT r9 item 2), applied to the
  * batch reducer.
  *
  * Determinism: insertion keeps pairs sorted ascending and ties cannot
  * occur (ids are unique within a group), so eval order is the sorted
  * order regardless of input partitioning — the same contract the
  * array_sort formulation had.
  */
case class TopKPairsAgg(
    scoreNeg: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsAgg.Buf] {

  require(k > 0, s"topk_pairs needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(scoreNeg, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neg", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreNeg.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (BIGINT, BIGINT), got " +
        s"(${scoreNeg.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKPairsAgg.Buf =
    new TopKPairsAgg.Buf(k)

  override def update(buf: TopKPairsAgg.Buf, input: InternalRow): TopKPairsAgg.Buf = {
    val n = scoreNeg.eval(input)
    val i = id.eval(input)
    if (n != null && i != null)
      buf.insert(n.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairsAgg.Buf, other: TopKPairsAgg.Buf): TopKPairsAgg.Buf = {
    var j = 0
    while (j < other.cnt) {
      buf.insert(other.negs(j), other.ids(j))
      j += 1
    }
    buf
  }

  override def eval(buf: TopKPairsAgg.Buf): Any = {
    val rows = new Array[Any](buf.cnt)
    var j = 0
    while (j < buf.cnt) {
      rows(j) = InternalRow(buf.negs(j), buf.ids(j))
      j += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKPairsAgg.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.cnt * 16)
    bb.putInt(buf.cnt)
    var j = 0
    while (j < buf.cnt) {
      bb.putLong(buf.negs(j)); bb.putLong(buf.ids(j)); j += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsAgg.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKPairsAgg.Buf(k)
    val n = bb.getInt
    buf.cnt = n
    var j = 0
    while (j < n) {
      buf.negs(j) = bb.getLong; buf.ids(j) = bb.getLong; j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(scoreNeg = newChildren(0), id = newChildren(1))
}

object TopKPairsAgg {
  /** Sorted-ascending bounded buffer of (neg, id) pairs — k is ≤ tens, so
    * an O(k) shift insert beats heap bookkeeping and keeps eval order
    * free (already sorted). */
  final class Buf(val k: Int) {
    val negs = new Array[Long](k)
    val ids  = new Array[Long](k)
    var cnt  = 0

    def insert(n: Long, i: Long): Unit = {
      if (cnt == k && !less(n, i, negs(cnt - 1), ids(cnt - 1))) return
      var pos = cnt.min(k - 1)
      // shift larger entries right, dropping the overflow
      while (pos > 0 && less(n, i, negs(pos - 1), ids(pos - 1))) {
        negs(pos) = negs(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      negs(pos) = n; ids(pos) = i
      if (cnt < k) cnt += 1
    }

    @inline private def less(an: Long, ai: Long, bn: Long, bi: Long): Boolean =
      an < bn || (an == bn && ai < bi)
  }
}
