package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** EXACT distinct count over dense long ids via a bitmap aggregation
  * buffer — the ClickHouse `groupBitmap` / Doris `bitmap_union_count`
  * shape, as a Catalyst [[TypedImperativeAggregate]]: custom binary state
  * that partial-aggregates map-side and merges with a word-wise OR.
  *
  * Why it exists next to the two built-in routes: `COUNT(DISTINCT x)`
  * expands to an exact but EXPENSIVE two-shuffle plan (expand + regroup on
  * the value), and `approx_count_distinct` is one pass but approximate.
  * For the dense-id case — user ids, doc ids, any dictionary-encoded key —
  * a bitmap buffer gives the one-pass mergeable shape of the HLL at EXACT
  * precision: state is maxId/8 bytes per group regardless of row count,
  * each update is one bit-set, each merge a word-wise OR.
  *
  * Deliberate contract boundary: ids must lie in [0, 2²⁶) (an 8 MB ceiling
  * per group buffer); out-of-range ids fail loudly rather than degrade.
  * Production sparse/huge id spaces use a compressed (roaring) bitmap —
  * same aggregate shape, different buffer — which needs a library this
  * build excludes; the dense contract covers every synthetic-table key and
  * is exactly where the bitmap beats the hash set 64×.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet]
  with UnaryLike[Expression] {

  private val MaxBits: Long = 1L << 26

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_distinct requires a bigint argument, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_distinct"

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0L || id >= MaxBits)
        throw new IllegalArgumentException(
          s"graft_bitmap_distinct: id $id outside the dense contract [0, $MaxBits) — " +
            "use a compressed bitmap (roaring) for sparse id spaces")
      buf.set(id.toInt)
    }
    buf
  }

  override def merge(b1: java.util.BitSet, b2: java.util.BitSet): java.util.BitSet = {
    b1.or(b2)
    b1
  }

  override def eval(buf: java.util.BitSet): Any = buf.cardinality().toLong

  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}
