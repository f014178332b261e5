package graft

import org.apache.spark.sql.functions._

import graft.ops.{Mapwarper, MapwarperFixture}

/** Regenerates src/test/resources/mapwarper_golden.jsonl from the
  * embedded fixture. Run after a DELIBERATE fidelity change, then
  * review the diff by hand before committing:
  *   sbt "Test/runMain graft.GoldenGen"
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val got = Mapwarper.pipeline(
        Mapwarper.parseRecords(spark, MapwarperFixture.allLines))
      .select(to_json(struct(col("type"), col("obj"))).as("j"))
      .collect().map(_.getString(0)).sorted
    val path = java.nio.file.Paths.get("src/test/resources/mapwarper_golden.jsonl")
    java.nio.file.Files.writeString(path, got.mkString("\n") + "\n")
    println(s"wrote ${got.length} lines to $path")
    spark.stop()
  }
}
