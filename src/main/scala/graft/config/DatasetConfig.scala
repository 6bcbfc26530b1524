package graft.config

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

/** Reference-compatible YAML dataset config — the exact shape
  * xtable-utilities RunSync.java:286-300 consumes:
  *
  * {{{
  * sourceFormat: HUDI
  * targetFormats:
  *   - DELTA
  *   - ICEBERG
  * datasets:
  *   - tableBasePath: /data/my_table
  *     tableName: my_table
  *     partitionSpec: ts:DAY:yyyy-MM-dd     # optional
  *     namespace: my_db                     # optional
  * }}}
  *
  * Conversions are IN-PLACE like the reference: each target writes its
  * metadata plane (_delta_log/, metadata/, .hoodie/, snapshot/) under the
  * dataset's own tableBasePath — one physical table readable through every
  * synced format.
  */
case class DatasetEntry(
    tableBasePath: String,
    tableName: String,
    partitionSpec: Option[String],
    namespace: Option[String])

case class DatasetConfig(
    sourceFormat: String,
    targetFormats: Seq[String],
    datasets: Seq[DatasetEntry])

object DatasetConfig {

  private val yaml = new ObjectMapper(new YAMLFactory())

  def parse(content: String): DatasetConfig = {
    import scala.jdk.CollectionConverters._
    val n = yaml.readTree(content)
    require(n.hasNonNull("sourceFormat"), "config needs sourceFormat")
    require(n.hasNonNull("targetFormats"), "config needs targetFormats")
    require(n.hasNonNull("datasets"), "config needs datasets")
    DatasetConfig(
      n.get("sourceFormat").asText.toUpperCase,
      n.get("targetFormats").elements().asScala
        .map(_.asText.toUpperCase).toSeq,
      n.get("datasets").elements().asScala.map { d =>
        DatasetEntry(
          d.get("tableBasePath").asText,
          Option(d.get("tableName")).map(_.asText).getOrElse {
            val p = d.get("tableBasePath").asText.stripSuffix("/")
            p.substring(p.lastIndexOf('/') + 1)
          },
          Option(d.get("partitionSpec")).filterNot(_.isNull).map(_.asText),
          Option(d.get("namespace")).filterNot(_.isNull).map(_.asText))
      }.toSeq)
  }

  def parseFile(path: String): DatasetConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
