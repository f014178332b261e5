package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** HyperLogLog distinct-count sketch as a Catalyst
  * TypedImperativeAggregate — the user-controlled-precision complement
  * to Spark's built-in approx_count_distinct (ROADMAP #4).
  *
  * Why this shape at 100 TB: the aggregation state is a fixed 2^p-byte
  * register array (4 KiB at the default p=12) that Spark PARTIALLY
  * aggregates map-side and merges slot-wise-max at the exchange — the
  * shuffle moves one sketch per group per mapper, never the values.
  * Merge is associative+commutative, so the estimate is independent of
  * partitioning (pinned by HllSpec's repartition test).
  *
  * Algorithm: standard HLL (Flajolet et al. 2007) with the small-range
  * linear-counting correction; 64-bit xxhash64 input hashing makes the
  * large-range correction unnecessary. Estimate standard error ≈
  * 1.04/√(2^p) — 1.6% at p=12.
  */
/** Shared HLL register kernels: one update/merge/estimate
  * implementation behind the estimating aggregate ([[HllSketchAgg]]),
  * the sketch-emitting aggregate ([[HllSketchBytesAgg]]), and the
  * stored-sketch merger ([[HllMergeAgg]]) — so a sketch PERSISTED by
  * one and re-aggregated by another is register-for-register the
  * sketch a direct pass would have built (HllSpec pins that identity,
  * the property the persisted-rollup pattern rests on). */
private[functions] object Hll {
  def updateValue(buf: Array[Byte], v: Any, dt: DataType, p: Int): Unit = {
    val h = XxHash64Function.hash(v, dt, 42L)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading-zero run length in the remaining 64-p bits, 1-based
    val w = h << p
    val rank = (if (w == 0) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > buf(idx)) buf(idx) = rank.toByte
  }

  def mergeInto(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    require(b1.length == b2.length,
      s"HLL register width mismatch: ${b1.length} vs ${b2.length} — " +
        "sketches built at different precisions cannot merge")
    var i = 0
    while (i < b1.length) {
      if (b2(i) > b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Analysis-time guard shared by the two sketch-building aggregates:
    * the hasher iterates MapData in STORED ENTRY ORDER, so two
    * logically equal maps built in different orders hash apart and
    * inflate the distinct estimate silently — Spark bans xxhash64 /
    * exact count-distinct on maps at analysis for exactly this reason
    * (round-14 review). Rejects maps at any nesting depth. */
  def checkHashable(dt: org.apache.spark.sql.types.DataType,
                    name: String): TypeCheckResult = {
    def hasMap(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => true
      case org.apache.spark.sql.types.ArrayType(e, _) => hasMap(e)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    if (hasMap(dt))
      TypeCheckResult.TypeCheckFailure(
        s"$name cannot hash a map-bearing column (${dt.catalogString}): " +
          "map entry order is undefined, so equal maps would count as " +
          "distinct — convert with map_entries + array_sort first")
    else TypeCheckResult.TypeCheckSuccess
  }
}

/** Shared register lifecycle of the three HLL aggregates (the round-14
  * dedup of the twins' checkInputDataTypes/update/merge/serialize
  * blocks): fixed 2^p buffer, slot-wise-max merge, identity
  * serialization. Subclasses choose only what [[update]] consumes (raw
  * values vs stored registers) and what [[eval]] emits (estimate vs
  * registers) — one definition, so the persisted-sketch identity
  * (HllSpec) cannot drift between twins. */
private[functions] trait HllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  def child: Expression
  def p: Int
  require(p >= 4 && p <= 18, s"precision p must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)
  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    Hll.mergeInto(b1, b2)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
}

/** The sketch-BUILDING side (raw values in): hashability gate + the
  * register update, shared by the estimating and emitting twins. */
private[functions] trait HllBuildingAgg extends HllAggBase {
  override def checkInputDataTypes(): TypeCheckResult =
    Hll.checkHashable(child.dataType, prettyName)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.updateValue(buf, v, child.dataType, p)
    buf
  }
}

case class HllSketchAgg(child: Expression, p: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends HllBuildingAgg {

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_distinct"

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = cs.head)
}

/** The SKETCH-EMITTING twin of [[HllSketchAgg]]: same registers, but
  * the aggregate's value is the register array itself (BINARY) — the
  * column a 100 TB pipeline PERSISTS per (partition, group) so any
  * later rollup merges kilobyte sketches instead of re-scanning the
  * corpus. Re-aggregate stored sketches with [[HllMergeAgg]]. */
case class HllSketchBytesAgg(child: Expression, p: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends HllBuildingAgg {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"

  // clone: the buffer object is mutable aggregation state
  override def eval(buf: Array[Byte]): Any = buf.clone()

  override def withNewMutableAggBufferOffset(o: Int): HllSketchBytesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchBytesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllSketchBytesAgg =
    copy(child = cs.head)
}

/** Merge STORED sketches (a BINARY column written by
  * [[HllSketchBytesAgg]]) into one distinct-count estimate — the
  * rollup side of the persisted-sketch pattern: per-vintage sketches
  * in a tiny table answer any grouping's distinct count without
  * touching the data they summarize. Fails fast on register-width
  * mismatch (sketches from different precisions are not mergeable). */
case class HllMergeAgg(child: Expression, p: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends HllAggBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_merge"

  // analysis-time guard: the child must be a stored-register BINARY
  // column; anything else died per-row as a ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_merge expects a binary register column (from hll_sketch), " +
        s"got ${other.catalogString}")
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def withNewMutableAggBufferOffset(o: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = cs.head)
}

object HllSketchAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: approximate distinct count of `c` at 2^p
    * registers (default p=12 ⇒ ~1.6% standard error, 4 KiB state). */
  def hllDistinct(c: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(c), p).toAggregateExpression())

  /** Aggregate Column: the sketch ITSELF (2^p register bytes) — the
    * persistable form; roll up later with [[hllMergeEstimate]]. */
  def hllSketch(c: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HllSketchBytesAgg(ColumnBridge.expression(c), p).toAggregateExpression())

  /** Aggregate Column: distinct-count estimate from MERGED stored
    * sketches (a binary column produced by [[hllSketch]]). */
  def hllMergeEstimate(c: Column, p: Int = 12): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(c), p).toAggregateExpression())
}
