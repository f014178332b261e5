package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Formats

class FormatParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: DataFrame): Array[String] = {
    import org.apache.spark.sql.functions._
    df.select(to_json(struct(df.columns.map(col): _*)).as("j"))
      .collect().map(_.getString(0)).sorted
  }

  test("CSV sink/source round-trips lineitem losslessly (schema declared, no inference)") {
    val src = Tables.lineitem(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("fmt_csv").toString + "/lineitem"
    Formats.writeCsv(src, dir)
    val back = Formats.readCsv(spark, src.schema, dir)
    assert(back.schema == src.schema, "declared schema must survive")
    val a = canon(src); val b = canon(back)
    assert(a.length == b.length && a.sameElements(b),
      s"CSV round-trip diverged (rows ${a.length} vs ${b.length})")
  }

  test("CSV round-trips embedded newlines and quotes (multiLine read, loud on divergence)") {
    // lineitem has no embedded newlines, so the lossless contract was
    // untested exactly where CSV breaks (round-14 review): the writer
    // quotes a field containing '\n'; a non-multiLine reader splits it
    // into two malformed physical rows and PERMISSIVE nulls them out
    // silently — row count changes and nobody throws
    import spark.implicits._
    val src = Seq(
      (1L, "plain text"),
      (2L, "two\nphysical\nlines"),
      (3L, "a \"quoted\" bit, with comma"),
      (4L, null.asInstanceOf[String])).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("fmt_csv_nl").toString + "/docs"
    Formats.writeCsv(src, dir)
    val back = Formats.readCsv(spark, src.schema, dir)
    assert(canon(src).sameElements(canon(back)),
      "newline/quote-bearing strings must survive the CSV round-trip")
  }

  test("ORC sink/source round-trips lineitem losslessly") {
    val src = Tables.lineitem(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("fmt_orc").toString + "/lineitem"
    Formats.writeOrc(src, dir)
    val back = Formats.readOrc(spark, src.schema, dir)
    assert(back.schema == src.schema)
    assert(canon(src).sameElements(canon(back)))
  }

  test("CSV read pushes the declared schema — a q01-style agg matches the parquet path") {
    import org.apache.spark.sql.functions._
    val src = Tables.lineitem(spark, TestSpark.sf0001)
    val dir = java.nio.file.Files.createTempDirectory("fmt_csv_q").toString + "/lineitem"
    Formats.writeCsv(src, dir)
    def agg(df: DataFrame) = df.groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect().toSeq
    assert(agg(Formats.readCsv(spark, src.schema, dir)) == agg(src))
  }
}
