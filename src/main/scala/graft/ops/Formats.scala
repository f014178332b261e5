package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format parity beyond parquet+NDJSON (ROADMAP #5): CSV
  * and ORC, both with DECLARED schemas on read — the engine never
  * infers (SURVEY §1.3). Spark-avro isn't in the jar set (only the
  * raw Avro library), so Avro is out of scope for this container.
  *
  * CSV notes for lossless round-trips: header on, explicit ISO-8601
  * timestamp format with microseconds (the writer default drops
  * sub-second digits on some paths), and doubles survive via Java's
  * shortest-round-trip Double formatting.
  */
object Formats {

  val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      .csv(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", TsFormat)
      // lossless contract, part 2: the writer quotes embedded newlines;
      // without multiLine the reader splits such a record across two
      // physical lines, and PERMISSIVE would then hand back null-padded
      // fragments SILENTLY — parse divergence must be loud
      .option("multiLine", "true")
      .option("mode", "FAILFAST")
      .csv(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)
}
