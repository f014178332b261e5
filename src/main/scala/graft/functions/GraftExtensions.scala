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
        case other => MinHashSig(other.head, 64)
      }))
    e.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 63-bit SimHash of array<string>"),
      (es: Seq[Expression]) => SimHash64(es.head)))
  }
}
