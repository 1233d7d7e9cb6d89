package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Custom Catalyst AGGREGATES (cf. Native's scalar expressions).
  *
  * BoundedTopK — exact per-group top-k rows by a weight column, as a
  * TypedImperativeAggregate whose buffer never exceeds ~2k entries.
  *
  * Why an aggregate and not a window: the built-in exact form —
  * `row_number() OVER (PARTITION BY g ORDER BY w DESC)` — shuffles
  * EVERY row of every group to its group's task before discarding all
  * but k. The aggregate form bounds the work map-side: each partition
  * keeps at most k candidates per group (partial aggregation), the
  * shuffle carries ≤ k rows per (group × partition), and the merge is
  * k-sized. Same exact result, shuffle ∝ groups × k instead of rows —
  * the difference between a top-10 over 10¹² events working and not.
  * `collect_list` + sort is NOT equivalent: its buffer is unbounded.
  *
  * Determinism: total tiebreak (weight desc, value asc) — the same
  * contract as topKPerQuery/oracle `ORDER BY w DESC, v ASC`.
  */
object Aggregates {

  /** Exact top-k (value, weight) pairs per group, ordered by
    * (weight desc, value asc). Long value + long weight — the
    * id-and-count shape of event/token rollups.
    */
  case class BoundedTopK(
      valueExpr: Expression, weightExpr: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]] {
    require(k > 0, s"k must be > 0, got $k")

    override def children: Seq[Expression] = Seq(valueExpr, weightExpr)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("value", LongType, nullable = false),
      StructField("weight", LongType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
      ArrayBuffer.empty

    // (weight desc, value asc): the deterministic contract
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

    private def trim(buf: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
      if (buf.length > k) {
        val sorted = buf.sortWith(lt).take(k)
        buf.clear(); buf ++= sorted
      }
      buf
    }

    override def update(
        buf: ArrayBuffer[(Long, Long)], input: InternalRow): ArrayBuffer[(Long, Long)] = {
      val v = valueExpr.eval(input)
      val w = weightExpr.eval(input)
      if (v != null && w != null) {
        buf += ((v.asInstanceOf[Long], w.asInstanceOf[Long]))
        // amortize: sort-and-cut only when the buffer doubles past k
        if (buf.length >= 2 * k) trim(buf)
      }
      buf
    }

    override def merge(
        b1: ArrayBuffer[(Long, Long)], b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
      b1 ++= b2
      trim(b1)
    }

    override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
      val top = buf.sortWith(lt).take(k)
      new GenericArrayData(top.map { case (v, w) =>
        InternalRow(v, w)
      }.toArray[Any])
    }

    override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
      val trimmed = trim(buf)
      val bb = java.nio.ByteBuffer.allocate(4 + trimmed.length * 16)
      bb.putInt(trimmed.length)
      trimmed.foreach { case (v, w) => bb.putLong(v); bb.putLong(w) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new ArrayBuffer[(Long, Long)](n)
      var i = 0
      while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
    override def prettyName: String = "bounded_top_k"
  }

  /** agg-ready Column: array<struct<value, weight>> of the exact top-k
    * by (weight desc, value asc). Explode + posexplode for row form.
    */
  def topKByWeight(value: Column, weight: Column, k: Int): Column =
    GraftBridge.column(
      BoundedTopK(GraftBridge.expr(value), GraftBridge.expr(weight), k)
        .toAggregateExpression())
}
