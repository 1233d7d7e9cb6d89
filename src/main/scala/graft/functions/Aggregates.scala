package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

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

  /** Both aggregates read their children as boxed Longs on executors —
    * reject anything else at ANALYSIS time with a clear message instead
    * of a mid-job ClassCastException.
    */
  private def requireLongInputs(
      name: String, exprs: Seq[(String, Expression)]): TypeCheckResult = {
    exprs.collectFirst {
      case (what, e) if e.dataType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires BIGINT $what, got ${e.dataType.simpleString} — cast('long') it")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

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
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongInputs("bounded_top_k",
        Seq("value" -> valueExpr, "weight" -> weightExpr))
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

  /** BoundedTopK with a DOUBLE weight and a direction flag — the
    * distance/similarity shape of the ANN epilogues: per-query top-k by
    * (adc_dist asc, id asc) or (similarity desc, id asc). Same bounded
    * map-side contract as BoundedTopK (buffer ≤ ~2k entries, shuffle ∝
    * groups × k); the per-query `row_number` window it replaces holds
    * EVERY scored corpus row of a query in one WindowExec task — the
    * whole-corpus-per-task funnel that dies first at 100 TB.
    *
    * Ordering is total even on pathological weights: doubles compare by
    * `java.lang.Double.compare` (NaN sorts greatest, -0.0 < 0.0), ties
    * break on value asc — deterministic under any partitioning.
    *
    * Deliberately a sibling of BoundedTopK rather than a shared
    * codec-parameterized base: the two serde/trim loops are the hot
    * path of a per-row aggregate, and keeping each monomorphic and
    * flat is worth the ~80 duplicated lines (changes to the buffer
    * contract must be applied to both — see BoundedTopK).
    */
  case class BoundedTopKDouble(
      valueExpr: Expression, weightExpr: Expression, k: Int, ascending: Boolean,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[ArrayBuffer[(Long, Double)]] {
    require(k > 0, s"k must be > 0, got $k")

    override def children: Seq[Expression] = Seq(valueExpr, weightExpr)
    override def checkInputDataTypes(): TypeCheckResult =
      if (valueExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"bounded_top_k_double requires BIGINT value, got ${valueExpr.dataType.simpleString} — cast('long') it")
      else if (weightExpr.dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          s"bounded_top_k_double requires DOUBLE weight, got ${weightExpr.dataType.simpleString} — cast('double') it")
      else TypeCheckResult.TypeCheckSuccess
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("value", LongType, nullable = false),
      StructField("weight", DoubleType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): ArrayBuffer[(Long, Double)] =
      ArrayBuffer.empty

    // (weight asc|desc, value asc): total order, deterministic
    private def lt(a: (Long, Double), b: (Long, Double)): Boolean = {
      val c0 = java.lang.Double.compare(a._2, b._2)
      val c = if (ascending) c0 else -c0
      c < 0 || (c == 0 && a._1 < b._1)
    }

    private def trim(buf: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
      if (buf.length > k) {
        val sorted = buf.sortWith(lt).take(k)
        buf.clear(); buf ++= sorted
      }
      buf
    }

    override def update(
        buf: ArrayBuffer[(Long, Double)], input: InternalRow): ArrayBuffer[(Long, Double)] = {
      val v = valueExpr.eval(input)
      val w = weightExpr.eval(input)
      if (v != null && w != null) {
        buf += ((v.asInstanceOf[Long], w.asInstanceOf[Double]))
        if (buf.length >= 2 * k) trim(buf)
      }
      buf
    }

    override def merge(
        b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
      b1 ++= b2
      trim(b1)
    }

    override def eval(buf: ArrayBuffer[(Long, Double)]): Any = {
      val top = buf.sortWith(lt).take(k)
      new GenericArrayData(top.map { case (v, w) =>
        InternalRow(v, w)
      }.toArray[Any])
    }

    override def serialize(buf: ArrayBuffer[(Long, Double)]): Array[Byte] = {
      val trimmed = trim(buf)
      val bb = java.nio.ByteBuffer.allocate(4 + trimmed.length * 16)
      bb.putInt(trimmed.length)
      trimmed.foreach { case (v, w) => bb.putLong(v); bb.putDouble(w) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Double)] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new ArrayBuffer[(Long, Double)](n)
      var i = 0
      while (i < n) { buf += ((bb.getLong, bb.getDouble)); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKDouble =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKDouble =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
    override def prettyName: String = "bounded_top_k_double"
  }

  /** agg-ready Column: array<struct<value, weight>> of the exact top-k
    * long values by double weight — `ascending = true` keeps the k
    * SMALLEST weights (distance), false the k LARGEST (similarity);
    * ties break on value asc either way.
    */
  def topKByDoubleWeight(
      value: Column, weight: Column, k: Int, ascending: Boolean): Column =
    GraftBridge.column(
      BoundedTopKDouble(GraftBridge.expr(value), GraftBridge.expr(weight), k, ascending)
        .toAggregateExpression())

  /** All 2R Poisson-bootstrap partial sums in ONE tight per-row loop —
    * the fused form of [[graft.ops.Stats.bootstrapMeanCI]]'s
    * 2R-conditional-sum expression list (R = 64 meant ~130 interpreted
    * when-chains per row; this is one JIT-able loop over a long[2R]
    * buffer). Buffer slot 2r holds Σ c_r·x, slot 2r+1 holds Σ c_r,
    * where c_r = Poisson(1) count drawn from the portable per-key hash
    * via the fixed threshold chain. Exact long arithmetic throughout —
    * sums are order-free, so partitioning cannot move a bit, and
    * multiplyExact/addExact replay ANSI's loud overflow. Null value or
    * hash rows are skipped (the expression form's sum-over-null
    * behavior; the caller filters them anyway).
    */
  case class BootstrapSums(
      valueExpr: Expression, hashExpr: Expression,
      multipliers: Array[Long], thresholds: Array[Long],
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Long]] {
    require(multipliers.nonEmpty, "bootstrap_sums: need at least one replica")
    private val R = multipliers.length
    private val P = PortableHash.P

    override def children: Seq[Expression] = Seq(valueExpr, hashExpr)
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongInputs("bootstrap_sums",
        Seq(("value", valueExpr), ("hash", hashExpr)))
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * R)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val x = valueExpr.eval(input)
      val h = hashExpr.eval(input)
      if (x != null && h != null) {
        val xv = x.asInstanceOf[Long]
        val hv = h.asInstanceOf[Long]
        var r = 0
        while (r < R) {
          // u = pmod((h + 1)·m_r + r, P): identical to the expression
          // chain (pmod = floorMod; the products stay under 2^62 for
          // hashes in [0, P) but the exact ops keep parity regardless)
          val u = java.lang.Math.floorMod(
            Math.addExact(Math.multiplyExact(
              Math.addExact(hv, 1L), multipliers(r)), r.toLong), P)
          // c = index of the first threshold ABOVE u (thresholds
          // ascending), else thresholds.length — the when-chain's value
          var c = 0
          while (c < thresholds.length && u >= thresholds(c)) c += 1
          if (c > 0) {
            buf(2 * r) = Math.addExact(buf(2 * r), Math.multiplyExact(c.toLong, xv))
            buf(2 * r + 1) = Math.addExact(buf(2 * r + 1), c.toLong)
          }
          r += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) = Math.addExact(b1(i), b2(i)); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val buf = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapSums =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BootstrapSums =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(valueExpr = newChildren(0), hashExpr = newChildren(1))
    override def prettyName: String = "bootstrap_sums"
  }

  /** agg-ready Column: long[2R] of interleaved (Σ c_r·x, Σ c_r)
    * Poisson-bootstrap partials — see [[BootstrapSums]]. */
  def bootstrapSums(
      value: Column, hash: Column,
      multipliers: Array[Long], thresholds: Array[Long]): Column =
    GraftBridge.column(
      BootstrapSums(GraftBridge.expr(value), GraftBridge.expr(hash),
        multipliers, thresholds).toAggregateExpression())

  /** Mergeable weighted-quantile sketch over LONG values + LONG weights
    * — the shipped 100 TB path for weighted percentiles (the built-in
    * `approx_percentile` takes no weights; the exact form sorts every
    * group). Buffer: value→weight-sum buckets at a power-of-two
    * `stride`, starting at 1. While distinct buckets ≤ `capacity` the
    * sketch is EXACT (stride 1, every value its own bucket — the
    * oracle-checkable configuration, cf. the full-recall LSH gates);
    * past capacity the stride doubles and buckets pairwise collapse, so
    * the result is the true quantile's bucket lower bound within
    * `stride` (≤ value-range / capacity). Deterministic and
    * ORDER-INVARIANT: weights accumulate in Long (no float rounding),
    * collapse points depend only on the bucket-count watermark — so
    * update/merge order and partitioning cannot change the result.
    *
    * Returns the smallest bucket lower bound whose cumulative weight
    * reaches q × total (the lower weighted quantile), null for an
    * empty group.
    */
  case class WeightedQuantileSketch(
      valueExpr: Expression, weightExpr: Expression, q: Double, capacity: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[WeightedQuantileSketch.Buf] {
    require(q >= 0 && q <= 1, s"q must be in [0,1], got $q")
    require(capacity >= 2, s"capacity must be >= 2, got $capacity")
    import WeightedQuantileSketch.Buf

    override def children: Seq[Expression] = Seq(valueExpr, weightExpr)
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongInputs("weighted_quantile_sketch",
        Seq("value" -> valueExpr, "weight" -> weightExpr))
    override def nullable: Boolean = true
    override def dataType: DataType = LongType

    override def createAggregationBuffer(): Buf = new Buf(1L)

    // bucket i at stride s == bucket floorDiv(i,2) at stride 2s
    private def halve(m: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
      val next = new java.util.HashMap[Long, Long](m.size / 2 + 1)
      m.forEach { (k, w) =>
        val nk = Math.floorDiv(k, 2L)
        next.put(nk, next.getOrDefault(nk, 0L) + w)
      }
      next
    }

    private def collapseUntilFits(b: Buf): Unit =
      while (b.map.size > capacity) { b.map = halve(b.map); b.stride *= 2 }

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = valueExpr.eval(input)
      val w = weightExpr.eval(input)
      if (v != null && w != null) {
        val key = Math.floorDiv(v.asInstanceOf[Long], b.stride)
        b.map.put(key, b.map.getOrDefault(key, 0L) + w.asInstanceOf[Long])
        collapseUntilFits(b)
      }
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      // align both sides to the larger stride, then sum buckets
      while (b1.stride < b2.stride) { b1.map = halve(b1.map); b1.stride *= 2 }
      var (m2, s2) = (b2.map, b2.stride)
      while (s2 < b1.stride) { m2 = halve(m2); s2 *= 2 }
      m2.forEach { (k, w) =>
        b1.map.put(k, b1.map.getOrDefault(k, 0L) + w)
      }
      collapseUntilFits(b1)
      b1
    }

    override def eval(b: Buf): Any = {
      if (b.map.isEmpty) return null
      val keys = new Array[Long](b.map.size)
      var i = 0
      val it = b.map.keySet().iterator()
      while (it.hasNext) { keys(i) = it.next(); i += 1 }
      java.util.Arrays.sort(keys)
      var total = 0L
      b.map.forEach { (_, w) => total += w }
      val threshold = q * total.toDouble
      var cum = 0L
      var j = 0
      while (j < keys.length) {
        cum += b.map.get(keys(j))
        if (cum.toDouble >= threshold) return keys(j) * b.stride
        j += 1
      }
      keys(keys.length - 1) * b.stride
    }

    override def serialize(b: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + b.map.size * 16)
      bb.putLong(b.stride)
      bb.putInt(b.map.size)
      b.map.forEach { (k, w) => bb.putLong(k); bb.putLong(w) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val b = new Buf(bb.getLong)
      val n = bb.getInt
      var i = 0
      while (i < n) { b.map.put(bb.getLong, bb.getLong); i += 1 }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): WeightedQuantileSketch =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): WeightedQuantileSketch =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
    override def prettyName: String = "weighted_quantile_sketch"
  }

  object WeightedQuantileSketch {
    final class Buf(var stride: Long) {
      var map = new java.util.HashMap[Long, Long]()
    }
  }

  /** agg-ready Column: weighted q-quantile of a LONG value column via
    * the mergeable sketch (exact while the group has ≤ capacity
    * distinct values).
    */
  def weightedQuantileSketch(
      value: Column, weight: Column, q: Double, capacity: Int = 4096): Column =
    GraftBridge.column(
      WeightedQuantileSketch(GraftBridge.expr(value), GraftBridge.expr(weight), q, capacity)
        .toAggregateExpression())

  /** Space-Saving heavy hitters: one-pass approximate top-k values by
    * FREQUENCY over raw rows — no per-value pre-aggregation shuffle at
    * all (contrast BoundedTopK, which ranks already-aggregated
    * weights). Classic Metwally et al. semantics:
    *  - capacity ≥ distinct values → no eviction ever happens, counts
    *    are EXACT and the result is order/partitioning-invariant (the
    *    oracle-checkable configuration);
    *  - past capacity, the smallest counter is evicted and its count
    *    inherited: reported count ≥ true count ≥ reported − error, any
    *    value with true count > N/capacity is guaranteed present.
    *    Like any Space-Saving sketch the approximate counts depend on
    *    arrival order — document and spec-grade the GUARANTEES, not
    *    equality (every other operator in this library is
    *    order-invariant; this one trades that for one-pass frequency
    *    estimation, and says so).
    * Output: array<struct<value, count, error>> of the top `outputK`
    * by (count desc, value asc).
    */
  case class SpaceSavingTopK(
      valueExpr: Expression, capacity: Int, outputK: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[SpaceSavingTopK.SSBuf] {
    require(capacity > 0 && outputK > 0 && outputK <= capacity,
      s"need 0 < outputK <= capacity, got outputK=$outputK capacity=$capacity")

    override def children: Seq[Expression] = Seq(valueExpr)
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongInputs("space_saving_top_k", Seq("value" -> valueExpr))
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("value", LongType, nullable = false),
      StructField("count", LongType, nullable = false),
      StructField("error", LongType, nullable = false))), containsNull = false)

    type Buf = SpaceSavingTopK.SSBuf

    override def createAggregationBuffer(): Buf = new SpaceSavingTopK.SSBuf()

    private def add(b: Buf, v: Long, c: Long, e: Long): Unit = {
      val cur = b.map.get(v)
      if (cur != null) { cur(0) += c; cur(1) += e } // heap entry goes stale; fixed lazily
      else if (b.map.size < capacity) {
        b.map.put(v, Array(c, e))
        b.heap.add(Array(c, v))
      } else {
        // lazy min-heap eviction: pop until the head's count snapshot
        // matches the entry's CURRENT count (stale heads — values that
        // were incremented since push — are re-pushed with their
        // current count). Amortized O(log capacity) per eviction; the
        // exhaustive min-scan this replaces was O(capacity) per evicted
        // row — O(rows × capacity) on rare-value-heavy streams.
        var w = 0L; var wc = 0L; var found = false
        while (!found) {
          val head = b.heap.poll()
          val ce = b.map.get(head(1))
          if (ce != null && ce(0) == head(0)) { w = head(1); wc = ce(0); found = true }
          else if (ce != null) b.heap.add(Array(ce(0), head(1)))
          // ce == null: value already evicted — drop the stale entry
        }
        b.map.remove(w)
        b.map.put(v, Array(wc + c, wc + e)) // inherit the evicted count as error
        b.heap.add(Array(wc + c, v))
      }
    }

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = valueExpr.eval(input)
      if (v != null) add(b, v.asInstanceOf[Long], 1L, 0L)
      b
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      b2.map.forEach { (v, ce) => add(b1, v, ce(0), ce(1)) }
      b1
    }

    override def eval(b: Buf): Any = {
      val entries = new ArrayBuffer[(Long, Long, Long)](b.map.size)
      b.map.forEach { (v, ce) => entries += ((v, ce(0), ce(1))) }
      val top = entries.sortWith((a, c) =>
          a._2 > c._2 || (a._2 == c._2 && a._1 < c._1))
        .take(outputK)
      new GenericArrayData(top.map { case (v, c, e) =>
        InternalRow(v, c, e)
      }.toArray[Any])
    }

    override def serialize(b: Buf): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + b.map.size * 24)
      bb.putInt(b.map.size)
      b.map.forEach { (v, ce) => bb.putLong(v); bb.putLong(ce(0)); bb.putLong(ce(1)) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new SpaceSavingTopK.SSBuf()
      var i = 0
      while (i < n) {
        val v = bb.getLong; val c = bb.getLong; val e = bb.getLong
        b.map.put(v, Array(c, e))
        b.heap.add(Array(c, v))
        i += 1
      }
      b
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(valueExpr = newChildren(0))
    override def prettyName: String = "space_saving_top_k"
  }

  object SpaceSavingTopK {
    /** value → [count, error] plus a lazy min-heap of [countSnapshot,
      * value] for O(log capacity) eviction; (count asc, value desc)
      * heap order keeps victim selection deterministic.
      */
    final class SSBuf {
      val map = new java.util.HashMap[Long, Array[Long]]()
      val heap = new java.util.PriorityQueue[Array[Long]](
        (a: Array[Long], b: Array[Long]) => {
          val c = java.lang.Long.compare(a(0), b(0))
          if (c != 0) c else java.lang.Long.compare(b(1), a(1))
        })
    }
  }

  /** agg-ready Column: one-pass heavy hitters (top `outputK` LONG
    * values by frequency) with a `capacity`-bounded buffer.
    */
  def heavyHitters(value: Column, outputK: Int, capacity: Int = 4096): Column =
    GraftBridge.column(
      SpaceSavingTopK(GraftBridge.expr(value), capacity, outputK)
        .toAggregateExpression())

  /** KMV (k-minimum-values) distinct sketch: the k smallest DISTINCT
    * hash values seen, as an ascending long array — the state behind
    * [[graft.ops.Stats.kmvOverlap]]'s union/intersection/Jaccard
    * estimates (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD'07).
    *
    * Why an aggregate and not `distinct().orderBy().limit(k)`: the
    * latter shuffles EVERY distinct hash to dedupe before the head;
    * this buffer dedupes and trims map-side, so the shuffle carries at
    * most k longs per partition — a 100 TB corpus reduces to one
    * k-sized row. Buffer is a sorted set capped at k (inserts past the
    * cap evict the max); dedup makes merge idempotent, so partial
    * aggregation and AQE re-merges are safe. Exactness falls out: a
    * final sketch smaller than k IS the complete distinct hash set.
    */
  case class KmvSketch(
      valueExpr: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
    require(k > 0, s"k must be > 0, got $k")

    override def children: Seq[Expression] = Seq(valueExpr)
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongInputs("kmv_sketch", Seq("value" -> valueExpr))
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
      if (buf.size < k) { buf.add(v); () }
      else if (v < buf.last()) { buf.add(v); if (buf.size > k) buf.pollLast(); () }
    }

    override def update(
        buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = valueExpr.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long], b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) add(b1, it.next())
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next().longValue())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(valueExpr = newChildren(0))
    override def prettyName: String = "kmv_sketch"
  }

  /** agg-ready Column: ascending array of the k smallest distinct
    * LONG hash values (size < k means the exact distinct set).
    */
  def kmvSketch(value: Column, k: Int): Column =
    GraftBridge.column(
      KmvSketch(GraftBridge.expr(value), k).toAggregateExpression())
}
