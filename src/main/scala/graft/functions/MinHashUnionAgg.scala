package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator unioning per-document MinHash signatures into one
  * corpus-level sketch (elementwise min — the MinHash of a set union
  * IS the slotwise min of the sets' signatures). Lets a pipeline
  * estimate Jaccard overlap BETWEEN WHOLE CORPORA (per source, per
  * crawl, per language) from fixed 512-byte states: classic
  * mergeable-sketch shape — partial aggregation does the heavy merge
  * map-side, the shuffle carries one sketch per group per partition.
  */
class MinHashUnionAgg(slots: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(slots)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    // SQL aggregate convention (HllSketchAgg/CountMinAgg do the same):
    // a null input contributes nothing — MinHashSig is null-in/null-out,
    // so a null-text document reaches here as a null signature
    if (sig == null) return buf
    // a SHORT signature would leave trailing slots at Long.MaxValue,
    // and sigMatches counts MaxValue==MaxValue as matching slots — a
    // slots/SigLen wiring drift must fail loudly, not inflate Jaccard
    require(sig.length >= slots,
      s"MinHashUnionAgg($slots) fed a ${sig.length}-slot signature")
    var i = 0
    while (i < slots) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < slots) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnionAgg {
  /** Untyped (DataFrame groupBy/agg) form. */
  def udafColumn(slots: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new MinHashUnionAgg(slots),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
}
