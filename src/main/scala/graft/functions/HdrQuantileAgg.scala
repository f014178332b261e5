package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Mergeable QUANTILE sketch as a Catalyst TypedImperativeAggregate —
  * the quantile member of the suite's sketch family (HLL distincts,
  * Count-Min frequencies, SpaceSaving heavy hitters, hash reservoirs;
  * quantiles were the gap). Spark's percentile_approx answers one
  * query but its state is not a PERSISTABLE column, so it cannot play
  * the q173 stored-sketch-rollup game; this one can.
  *
  * Design: an HdrHistogram-style log-bucketed counter array over
  * non-negative longs. Values below 2^SubBits land in exact unit
  * buckets; above, each power-of-two octave splits into 2^SubBits
  * sub-buckets, so the relative width of any bucket is ≤ 2^-SubBits
  * (1.5625% at SubBits=6). A quantile readout walks the cumulative
  * counts and returns the target bucket's LOWER bound — a
  * deterministic under-estimate by at most one bucket width, which
  * makes the estimate independent of partitioning and merge order
  * (HdrSpec pins both), unlike interpolation-based summaries.
  *
  * Why this shape at 100 TB: state is a fixed ≤ ~[[Hdr.Size]]·8-byte
  * long array that Spark partially aggregates map-side; the exchange
  * moves one array per group per mapper, never the values. Merge is
  * element-wise addition — associative, commutative, and LOSSLESS
  * (unlike HLL/CMS the histogram itself is exact; only the readout
  * rounds to a bucket edge), so persisted per-vintage sketches roll
  * up to exactly the histogram a full re-scan would have built.
  */
private[graft] object Hdr {
  /** Sub-bucket precision bits: relative bucket width ≤ 2^-6. */
  val SubBits = 6
  private val SubCount = 1 << SubBits // 64
  /** Largest tracked exponent; values ≥ 2^MaxExp saturate into the
    * top bucket (n_chars/token counts sit far below 2^40). */
  val MaxExp = 40
  /** Counter slots: the exact unit range + one sub-bucketed octave
    * per exponent in (SubBits, MaxExp]. */
  val Size: Int = SubCount + (MaxExp - SubBits) * SubCount

  def indexOf(v0: Long): Int = {
    val v = if (v0 < 0) 0L else v0
    if (v < SubCount) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      // saturate: everything ≥ 2^MaxExp lands in the LAST bucket (the
      // sub-position bits of an out-of-range value are meaningless, and
      // clamping to the top keeps order: saturated ≥ every tracked value)
      if (e >= MaxExp) Size - 1
      else {
        val sp = ((v >> (e - SubBits)) & (SubCount - 1)).toInt
        SubCount + (e - SubBits) * SubCount + sp
      }
    }
  }

  /** Lower bound of bucket `idx` — the deterministic readout value. */
  def lowerBound(idx: Int): Long =
    if (idx < SubCount) idx.toLong
    else {
      val block = idx - SubCount
      val e = SubBits + block / SubCount
      val sp = (block % SubCount).toLong
      (1L << e) + (sp << (e - SubBits))
    }

  def update(buf: Array[Long], v: Long): Unit = buf(indexOf(v)) += 1L

  def mergeInto(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    require(b1.length == b2.length,
      s"HDR width mismatch: ${b1.length} vs ${b2.length} — " +
        "sketches built at different precisions cannot merge")
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  /** Lower-bound value at quantile q (0 < q ≤ 1): the value of the
    * bucket containing rank ⌈q·n⌉. Empty sketch → 0. */
  def quantile(buf: Array[Long], q: Double): Long = {
    var total = 0L
    var i = 0
    while (i < buf.length) { total += buf(i); i += 1 }
    if (total == 0L) return 0L
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    i = 0
    while (i < buf.length) {
      cum += buf(i)
      if (cum >= target) return lowerBound(i)
      i += 1
    }
    lowerBound(buf.length - 1)
  }

  /** One-pass readout of SEVERAL quantiles — the aggregate eval hot
    * path: the per-q form re-sums and re-walks the full Size-slot
    * histogram once per requested quantile, per group (round-14
    * review). Results positionally match `qs`; empty sketch → zeros,
    * like [[quantile]]. */
  def quantiles(buf: Array[Long], qs: Seq[Double]): Array[Long] = {
    var total = 0L
    var i = 0
    while (i < buf.length) { total += buf(i); i += 1 }
    val out = new Array[Long](qs.length)
    if (total == 0L) return out
    val order = qs.indices.sortBy(qs(_)).toArray
    val targets = order.map(j => math.max(1L, math.ceil(qs(j) * total).toLong))
    var k = 0
    var cum = 0L
    i = 0
    while (i < buf.length && k < order.length) {
      cum += buf(i)
      while (k < order.length && cum >= targets(k)) {
        out(order(k)) = lowerBound(i); k += 1
      }
      i += 1
    }
    while (k < order.length) { out(order(k)) = lowerBound(buf.length - 1); k += 1 }
    out
  }

  /** Sparse serialization: (int idx, long count) pairs for non-zero
    * slots — a near-empty group costs bytes, not Size·8. */
  def toBytes(buf: Array[Long]): Array[Byte] = {
    var nz = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0L) nz += 1; i += 1 }
    // leading Size header: persisted sketches outlive the build that
    // wrote them, and a SubBits/MaxExp change re-maps every bucket
    // index — without the header a stored sketch from another
    // precision would deserialize into silently-wrong buckets (the
    // HLL family gets this check for free because register width IS
    // the array length; here the sparse encoding hides it)
    val bb = java.nio.ByteBuffer.allocate(8 + nz * 12)
    bb.putInt(Size)
    bb.putInt(nz)
    i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) { bb.putInt(i); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](Size)
    addBytesInto(buf, bytes)
  }

  /** Adds a serialized sketch's sparse (idx, count) pairs STRAIGHT
    * into `buf` — the rollup hot path: fromBytes + mergeInto
    * allocated a dense Size-long (~18 KB) array and scanned every
    * slot per input ROW, where a stored per-group sketch typically
    * holds a handful of non-zero buckets (round-13 review). */
  def addBytesInto(buf: Array[Long], bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val size = bb.getInt
    require(size == Size,
      s"HDR sketch layout mismatch: stored Size=$size, this build Size=$Size " +
        "(SubBits/MaxExp changed) — rebuild the stored sketches")
    val nz = bb.getInt
    // validate BEFORE mutating buf: a truncated byte string (valid
    // header, pairs cut short) threw a raw BufferUnderflowException
    // mid-add, and a corrupt pair index an AIOOBE — the
    // stored-sketch-outlives-the-build case deserves the same named
    // failure as the Size header (round-14 review)
    require(nz >= 0 && bytes.length == 8 + nz.toLong * 12,
      s"HDR sketch truncated/corrupt: header says $nz pair(s) but " +
        s"${bytes.length} bytes (expected ${8 + nz.toLong * 12})")
    var k = 0
    while (k < nz) {
      val i = bb.getInt
      require(i >= 0 && i < Size,
        s"HDR sketch corrupt: bucket index $i outside [0, $Size)")
      buf(i) += bb.getLong; k += 1
    }
    buf
  }
}

/** Shared histogram lifecycle of the three HDR aggregates (the
  * round-14 dedup of the twins' checkInputDataTypes/update/merge/
  * serialize blocks — the HllAggBase pattern): fixed [[Hdr.Size]]
  * counter array, element-wise-add merge, validated byte
  * serialization. Subclasses choose only what [[update]] consumes
  * (raw longs vs stored sketch bytes) and what [[eval]] emits
  * (quantile readout vs bytes) — one definition, so the persisted
  * rollup identity (HdrSpec) cannot drift between twins. */
private[functions] trait HdrAggBase extends TypedImperativeAggregate[Array[Long]] {
  def child: Expression

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Array[Long] = new Array[Long](Hdr.Size)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    Hdr.mergeInto(b1, b2)
  override def serialize(buf: Array[Long]): Array[Byte] = Hdr.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Hdr.fromBytes(bytes)
}

/** The sketch-BUILDING side (raw integral values in): the
  * integral-only analysis gate + the bucket update, shared by the
  * estimating and emitting twins. */
private[functions] trait HdrBuildingAgg extends HdrAggBase {
  // analysis-time guard: a non-integral child would otherwise fail
  // per-row at execution (ClassCastException) — or WORSE, a double
  // would silently truncate 3.7→3 and skew every quantile readout
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral column (cast explicitly — a " +
        s"silent double truncation would skew quantiles), got ${other.catalogString}")
  }
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Hdr.update(buf, v.asInstanceOf[Number].longValue())
    buf
  }
}

/** The quantile-READOUT side: validated (0, 1] targets, array-of-
  * lower-bounds eval — shared by the direct and merge aggregates. */
private[functions] trait HdrQuantileReadout extends HdrAggBase {
  def qs: Seq[Double]
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    s"quantiles must sit in (0, 1], got $qs")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Hdr.quantiles(buf, qs))
}

/** Estimating aggregate: `hdr_quantiles(x, [q…])` → ARRAY<BIGINT> of
  * bucket-lower-bound values, one per requested quantile. */
case class HdrQuantileAgg(child: Expression, qs: Seq[Double],
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends HdrBuildingAgg with HdrQuantileReadout {

  override def prettyName: String = "hdr_quantiles"

  override def withNewMutableAggBufferOffset(o: Int): HdrQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HdrQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HdrQuantileAgg =
    copy(child = cs.head)
}

/** Sketch-emitting twin: the aggregate's value is the serialized
  * histogram (BINARY) — the column a pipeline PERSISTS per
  * (vintage, group) so later rollups merge sketches instead of
  * re-scanning (q173's pattern, for quantiles). */
case class HdrSketchBytesAgg(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends HdrBuildingAgg {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "hdr_sketch"

  override def eval(buf: Array[Long]): Any = Hdr.toBytes(buf)

  override def withNewMutableAggBufferOffset(o: Int): HdrSketchBytesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HdrSketchBytesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HdrSketchBytesAgg =
    copy(child = cs.head)
}

/** Rollup side: merge STORED sketches (a BINARY column written by
  * [[HdrSketchBytesAgg]]) and read out quantiles — element-wise
  * addition makes the rolled-up histogram IDENTICAL to one built by a
  * direct pass (HdrSpec pins the identity). */
case class HdrMergeAgg(child: Expression, qs: Seq[Double],
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends HdrQuantileReadout {

  override def prettyName: String = "hdr_merge"

  // analysis-time guard: the child must be a stored-sketch BINARY
  // column; anything else died per-row as a ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hdr_merge expects a binary sketch column (from hdr_sketch), " +
        s"got ${other.catalogString}")
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    // sparse add, no dense intermediate (see Hdr.addBytesInto)
    if (v != null) Hdr.addBytesInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HdrMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HdrMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): HdrMergeAgg =
    copy(child = cs.head)
}

object HdrQuantileAgg {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Aggregate Column: quantile lower-bound values of a non-negative
    * BIGINT column, one per entry of `qs`. */
  def hdrQuantiles(c: Column, qs: Seq[Double]): Column =
    ColumnBridge.column(
      HdrQuantileAgg(ColumnBridge.expression(c), qs).toAggregateExpression())

  /** Aggregate Column: the sketch ITSELF (sparse histogram bytes) —
    * the persistable form; roll up later with [[hdrMergeQuantiles]]. */
  def hdrSketch(c: Column): Column =
    ColumnBridge.column(
      HdrSketchBytesAgg(ColumnBridge.expression(c)).toAggregateExpression())

  /** Aggregate Column: quantiles from MERGED stored sketches (a
    * binary column produced by [[hdrSketch]]). */
  def hdrMergeQuantiles(c: Column, qs: Seq[Double]): Column =
    ColumnBridge.column(
      HdrMergeAgg(ColumnBridge.expression(c), qs).toAggregateExpression())
}
