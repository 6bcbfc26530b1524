package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.RunSync
import graft.sync.ConversionController
import graft.util.Jsons

/** REST conversion service — reference xtable-service
  * ConversionService.convertTable (ConversionService.java:190-236), OpenAPI
  * `POST /v1/conversion/table` (rest-service-open-api.yaml:56-97).
  * JDK built-in HttpServer; request/response JSON:
  *
  * {{{
  * POST /v1/conversion/table
  * { "tableName": "t", "sourceFormat": "PARQUET", "sourcePath": "/data/t",
  *   "targets": [{"format": "DELTA", "path": "/tables/t_delta"}] }
  * → { "outcomes": [{"target": "DELTA", "status": "SUCCESS", ...,
  *     "schemaString": "..."}] }
  * }}}
  */
class ConversionService(spark: SparkSession, port: Int = 0) {

  private val controller = new ConversionController
  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = server.getAddress.getPort

  server.createContext("/v1/conversion/table", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      try {
        if (ex.getRequestMethod != "POST") { respond(ex, 405,
          """{"error":"POST required"}"""); return }
        val cfg = Jsons.mapper.readTree(ex.getRequestBody)
        val name = cfg.get("tableName").asText
        val source = RunSync.buildSource(spark,
          cfg.get("sourceFormat").asText, cfg.get("sourcePath").asText, name)
        import scala.jdk.CollectionConverters._
        val targetDefs = cfg.get("targets").elements().asScala.map(t =>
          (t.get("format").asText, t.get("path").asText)).toSeq
        val targets = targetDefs.map { case (f, p) =>
          RunSync.buildTarget(spark, f, p) }
        val outcomes = controller.sync(source, targets)
        // response includes the synced target's schema in that FORMAT'S
        // native string form plus its metadata path — reference
        // extractSchemaString (ConversionService.java:266-285: HUDI→Avro,
        // ICEBERG→Iceberg JSON, DELTA→Spark JSON) and ConvertedTable's
        // targetMetadataPath
        val body = Jsons.toJson(Map("convertedTables" ->
          outcomes.zip(targetDefs).map { case (o, (f, p)) => Map(
            "targetFormat" -> o.targetFormat, "mode" -> o.mode,
            "status" -> o.status, "lastInstant" -> o.lastInstantSynced,
            "durationMillis" -> o.durationMillis,
            "error" -> o.error.orNull,
            "targetMetadataPath" -> (f.toUpperCase match {
              case "DELTA" => s"$p/_delta_log"
              case "ICEBERG" => graft.formats.iceberg.IcebergMetadata
                .metadataDir(p)
              case "HUDI" => s"$p/.hoodie"
              case _ => p
            }),
            "targetSchema" -> (try {
              val schema = RunSync.buildSource(spark, f, p, name)
                .currentTable().schema
              f.toUpperCase match {
                case "HUDI" => graft.model.AvroSchemas
                  .fromSpark(schema, "hudi_record").toString
                case "ICEBERG" =>
                  graft.formats.iceberg.IcebergSchemas.toIcebergJson(
                    graft.formats.iceberg.IcebergSchemas
                      .assignFieldIds(schema))
                case _ => schema.json
              }
            } catch { case _: Exception => null }))
          }))
        respond(ex, 200, body)
      } catch {
        case e: Exception =>
          respond(ex, 400, Jsons.toJson(Map("error" -> e.toString)))
      }
    }
  })

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    try ex.getResponseBody.write(bytes) finally ex.getResponseBody.close()
  }

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}

/** Service driver: runMain graft.service.ServeMain [port] */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-service")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val svc = new ConversionService(spark, port).start()
    println(s"""{"service":"graft-conversion","port":${svc.boundPort}}""")
    Thread.currentThread().join()
  }
}
