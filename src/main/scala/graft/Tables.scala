package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-provided testdata star schema
  * (see /root/repo/TESTDATA.md). All engine queries read through here so
  * scans stay uniform: explicit parquet, no schema inference surprises,
  * column pruning + filter pushdown handled by Catalyst/Parquet.
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * loader indirection keeps that swap localized to this file.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  /** The driver has generated events.parquet with ts as TIMESTAMP(NANOS)
    * in some rounds (which Spark's parquet reader rejects — read nanos
    * as long via the legacy conf, then DIV 1000 to micros) and as
    * TIMESTAMP(MICROS) without UTC adjustment in others (which Spark
    * reads as TIMESTAMP_NTZ). Branch on the dtype that actually arrives
    * so both vintages land on session-zone TimestampType (session tz is
    * UTC everywhere in this engine, so the NTZ cast is wall-clock
    * identity — same instants DuckDB's naive TIMESTAMP oracle sees). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    // nanosAsLong must be ON to even read a TIMESTAMP(NANOS) vintage's
    // schema, and the scan consults it at execution too — so for a
    // nanos vintage it has to stay set for the session (a deliberate,
    // documented session-level effect: any reader of nanos parquet
    // needs it). For every other vintage, restore the prior value so
    // one events read doesn't silently re-type unrelated nanos
    // datasets read later in the session.
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = s.conf.getOption(confKey)
    s.conf.set(confKey, "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType != org.apache.spark.sql.types.LongType)
      prior.fold(s.conf.unset(confKey))(v => s.conf.set(confKey, v))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
