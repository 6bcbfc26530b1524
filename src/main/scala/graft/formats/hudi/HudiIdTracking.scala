package graft.formats.hudi

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.types.StructType

import graft.formats.iceberg.IcebergSchemas
import graft.util.Jsons

/** Writer-side field-id persistence — the analog of the reference's
  * IdTracker (xtable-hudi-support IdTracker.java:51-120), which stores an
  * `hudi_id_tracking` property on the Hudi writer's Avro schema so Iceberg
  * field ids survive schema evolution performed by an external Hudi writer.
  *
  * Here the registry is a JSON blob in the Hudi commit's extraMetadata:
  * `{"lastIdUsed": N, "mappings": {"dotted.path": id, ...}}` with
  * collection positions under `element`/`key`/`value` pseudo-segments
  * (IdTracker.java:53-55 uses the same three names). The Hudi TARGET writes
  * it whenever the synced schema carries ids; the Hudi SOURCE re-applies it
  * after resolving the table schema — critically, also when the schema came
  * from the id-less Avro fallback path (a real Hudi writer's commit), which
  * is exactly the external-evolution case the reference built IdTracker
  * for. New fields added by that writer get fresh ids past `lastIdUsed`,
  * never recycling a dropped field's id.
  */
object HudiIdTracking {

  val Key = "graft.idTracking"

  /** Serialize the schema's id registry; None when the schema has no ids
    * (nothing to track — e.g. a plain parquet→Hudi sync).
    */
  def trackingJson(schema: StructType): Option[String] = {
    val ids = IcebergSchemas.allFieldIds(schema)
    if (ids.isEmpty) None
    else Some(Jsons.toJson(Map(
      "lastIdUsed" -> ids.values.max,
      "mappings" -> ids)))
  }

  /** Re-apply a persisted registry onto a (possibly id-less) schema. */
  def applyTracking(schema: StructType, json: String): StructType = {
    val n = Jsons.mapper.readTree(json)
    val mappings = n.get("mappings").properties().asScala
      .map(e => e.getKey -> e.getValue.asInt).toMap
    IcebergSchemas.withFieldIds(schema, mappings, n.get("lastIdUsed").asInt)
  }
}
