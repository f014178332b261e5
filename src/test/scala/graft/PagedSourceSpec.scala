package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas
import graft.ops.{Mapwarper, MapwarperFixture}

class PagedSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def stagePages(): String = {
    val dir = Files.createTempDirectory("pages")
    // split the fixture across 3 "API pages" like the PER_PAGE crawl
    val all = MapwarperFixture.allLines
    all.grouped((all.length + 2) / 3).zipWithIndex.foreach { case (chunk, i) =>
      Files.write(dir.resolve(f"page-$i%03d.ndjson"),
        (chunk.mkString("\n") + "\n\n").getBytes) // trailing blank line
    }
    dir.toString
  }

  test("one input partition per page, all lines read, blank lines dropped") {
    val dir = stagePages()
    val df = spark.read.format("graft.sources.PagedNdjsonSource")
      .option("path", dir).load()
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == MapwarperFixture.allLines.length)
    assert(df.select("page").distinct().count() == 3)
    assert(df.filter(col("error").isNotNull).count() == 0)
  }

  test("paged source + from_json feeds the pipeline identically") {
    val dir = stagePages()
    val records = spark.read.format("graft.sources.PagedNdjsonSource")
      .option("path", dir).load()
      .select(from_json(col("line"), Schemas.recordType).as("rec"))
      .select(col("rec.*"))
    val viaPages = Mapwarper.pipeline(records)
      .select(to_json(struct(col("type"), col("obj"))).as("j"))
      .collect().map(_.getString(0)).sorted
    val direct = Mapwarper.pipeline(
      Mapwarper.parseRecords(spark, MapwarperFixture.allLines))
      .select(to_json(struct(col("type"), col("obj"))).as("j"))
      .collect().map(_.getString(0)).sorted
    assert(viaPages.sameElements(direct))
  }

  test("a data line starting with the old reader sentinel is NOT misrouted to errors") {
    // the reader used to splice construction failures into the line
    // stream as "__READ_ERROR__..." — a legitimate line starting with
    // that text was silently rerouted to the error channel
    // (round-14 review; failures now ride an explicit flag)
    val dir = java.nio.file.Files.createTempDirectory("paged_sentinel")
    java.nio.file.Files.writeString(dir.resolve("page-0001.ndjson"),
      "__READ_ERROR__not actually an error\n{\"ok\":1}\n")
    val rows = spark.read.format("graft.sources.PagedNdjsonSource")
      .option("path", dir.toString).load()
      .select("line", "error").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.isNullAt(1)), s"no error rows expected: ${rows.toSeq}")
    assert(rows.exists(r => r.getString(0) == "__READ_ERROR__not actually an error"))
  }
}
