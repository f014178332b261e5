package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Config-wired registration of the engine's SQL functions:
  *
  *   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *
  * makes cosine_sim / minhash_sig / simhash64 available in every
  * session of the application without code (the programmatic
  * equivalent is NativeExprs.registerAll(spark)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - fused cosine similarity of two array<double>"),
      (es: Seq[Expression]) => CosineSim(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(tokens[, slots]) - MinHash signature of array<string>"),
      (es: Seq[Expression]) => es match {
        case Seq(t) => MinHashSig(t, 64)
        case Seq(t, Literal(slots: Int, _)) => MinHashSig(t, slots)
        case other => throw new IllegalArgumentException(
          s"minhash_sig expects (tokens[, slots INTEGER LITERAL]); got ${other.length} argument(s)")
      }))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 63-bit SimHash of array<string>"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    e.injectFunction((FunctionIdentifier("sig_matches"),
      info("sig_matches", "sig_matches(a, b) - equal-slot count of two array<bigint> signatures"),
      (es: Seq[Expression]) => SigMatches(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("quantize_i8"),
      info("quantize_i8", "quantize_i8(e) - max-abs int8 quantization of array<double> to binary"),
      (es: Seq[Expression]) => QuantizeI8(es.head)))
    e.injectFunction((FunctionIdentifier("cosine_sim_i8"),
      info("cosine_sim_i8", "cosine_sim_i8(a, b) - cosine of two int8-quantized binary vectors"),
      (es: Seq[Expression]) => CosineSimI8(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("hll_distinct"),
      info("hll_distinct", "hll_distinct(x[, p]) - HyperLogLog approximate distinct count (2^p registers)"),
      (es: Seq[Expression]) => es match {
        case Seq(c) => HllSketchAgg(c, 12)
        case Seq(c, Literal(p: Int, _)) => HllSketchAgg(c, p)
        case other => throw new IllegalArgumentException(
          s"hll_distinct expects (col[, p INTEGER LITERAL]); got ${other.length} argument(s)")
      }))
  }
}
