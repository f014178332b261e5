package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Typed view of the mapwarper output contract (SURVEY §1.3: Dataset[T]
  * case classes for the output types; the tagged DataFrame remains the
  * dynamic-schema surface). */

case class LogEntry(`type`: String, message: String)

case class ObjData(
    description: String, imageId: String, uuid: String, parentUuid: String,
    inset: Option[Boolean], masked: Option[Boolean],
    nyplUrl: String, tileUrl: String, area: Option[Double],
    gcps: Seq[Seq[Double]], mapCount: Option[Int], bbox: Seq[Double])

case class StObject(
    id: String, `type`: String, name: String,
    validSince: Option[Int], validUntil: Option[Int],
    data: ObjData, geometry: Geometry)

case class StRelation(`type`: String, from: String, to: String)

case class StLog(id: String, imageId: String, logs: Seq[LogEntry])

object Typed {

  /** st:Map objects from the tagged pipeline output. */
  def objects(spark: SparkSession, tagged: DataFrame): Dataset[StObject] = {
    import spark.implicits._
    tagged.filter(col("type") === "object")
      .select(col("obj.id"), col("obj.type"), col("obj.name"),
              col("obj.validSince"), col("obj.validUntil"),
              col("obj.data"), col("obj.geometry"))
      .as[StObject]
  }

  /** st:in relations. */
  def relations(spark: SparkSession, tagged: DataFrame): Dataset[StRelation] = {
    import spark.implicits._
    tagged.filter(col("type") === "relation")
      .select(col("obj.type"), col("obj.from"), col("obj.to"))
      .as[StRelation]
  }

  /** Dead-letter log records. */
  def logs(spark: SparkSession, tagged: DataFrame): Dataset[StLog] = {
    import spark.implicits._
    tagged.filter(col("type") === "log")
      .select(col("obj.id"), col("obj.imageId"), col("obj.logs"))
      .as[StLog]
  }
}
