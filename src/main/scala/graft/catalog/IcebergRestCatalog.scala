package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import graft.util.Jsons

/** Iceberg REST catalog client — the public REST catalog OpenAPI dialect
  * (iceberg `rest-catalog-open-api.yaml`): `/v1/config`, namespace CRUD,
  * `register` for externally-written tables (graft's filesystem tables
  * are exactly that), `LoadTableResponse` on load, DELETE on drop. This
  * is a REAL wire client (java.net.http over TCP) — paired with
  * [[IcebergRestCatalogServer]] it gives the catalog plane an actual
  * network round-trip, unlike the in-process Glue/HMS-semantics clients
  * (no Glue/HMS endpoint is reachable in this environment).
  *
  * Reference analog: the reference ships Glue/HMS catalog sync clients
  * (xtable-aws GlueCatalogSyncClient.java, xtable-hive-metastore
  * HMSCatalogSyncClient.java); REST is the modern Iceberg-native flavor
  * of the same pointer-registration contract.
  *
  * SPI mapping:
  *  - createTable → POST `/v1/{prefix}namespaces/{ns}/register`
  *    (RegisterTableRequest: name + metadata-location) — fails on 409;
  *  - refreshTable / createOrReplaceTable → register with
  *    `overwrite: true` (the spec's re-point form for external writers);
  *  - getTable → GET `…/tables/{t}` (LoadTableResponse), surfaced as a
  *    CatalogTableDef whose location/properties come from the embedded
  *    metadata;
  *  - partitions are no-ops: an Iceberg REST catalog derives
  *    partitioning from table metadata — there is no Hive partition
  *    plane to register into (listPartitions = Nil).
  *
  * The table's `metadata-location` rides in
  * `properties("metadata_location")` of the CatalogTableDef, the same
  * key the Glue builder uses.
  */
class IcebergRestCatalogClient(baseUri: String,
    override val catalogName: String = "rest")
  extends CatalogSyncClient {

  private val http = HttpClient.newHttpClient()

  /** `/v1/config` may route the client under a prefix (multi-tenant
    * catalogs) — fetched once, honored on every later path.
    */
  private val prefix: String = {
    val r = send(get(s"$baseUri/v1/config"))
    if (r.statusCode() != 200)
      throw new IllegalStateException(
        s"REST catalog config failed: HTTP ${r.statusCode()} ${r.body()}")
    val n = Jsons.mapper.readTree(r.body())
    Option(n.get("overrides")).flatMap(o => Option(o.get("prefix")))
      .map(p => p.asText() + "/").getOrElse("")
  }

  private def get(uri: String) =
    HttpRequest.newBuilder(URI.create(uri)).GET()

  private def post(uri: String, body: String) =
    HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))

  private def send(b: HttpRequest.Builder): HttpResponse[String] =
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())

  /** REST identifiers are NOT coerced through Glue's `[A-Za-z0-9_]`
    * alphabet — the spec allows arbitrary names, so each path segment is
    * percent-encoded verbatim and multi-level namespaces (dots in the
    * database) join with the spec's `%1F` unit separator.
    */
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
      .replace("+", "%20")

  private def nsPath(db: String): String =
    db.split('.').map(enc).mkString("%1F")

  private def nsUri(db: String) =
    s"$baseUri/v1/${prefix}namespaces/${nsPath(db)}"

  private def tableUri(id: CatalogTableIdentifier): String =
    s"$baseUri/v1/${prefix}namespaces/${nsPath(id.database)}" +
      s"/tables/${enc(id.table)}"

  /** 404 alone means "absent" — a 5xx from a broken catalog must fail
    * the sync loudly, not read as "namespace missing" and cascade into
    * create/register against a faulting server.
    */
  override def hasDatabase(db: String): Boolean = {
    val r = send(get(nsUri(db)))
    r.statusCode() match {
      case 200 => true
      case 404 => false
      case c => throw new IllegalStateException(
        s"namespace probe for $db failed: HTTP $c ${r.body()}")
    }
  }

  override def createDatabase(db: String): Unit = {
    val o = Jsons.mapper.createObjectNode()
    val levels = o.putArray("namespace")
    db.split('.').foreach(levels.add)
    o.putObject("properties")
    val r = send(post(s"$baseUri/v1/${prefix}namespaces",
      Jsons.mapper.writeValueAsString(o)))
    // 409 = already exists: createDatabase is called ensure-style
    if (r.statusCode() != 200 && r.statusCode() != 409)
      throw new IllegalStateException(
        s"createNamespace($db) failed: HTTP ${r.statusCode()} ${r.body()}")
  }

  override def getTable(id: CatalogTableIdentifier): Option[CatalogTableDef] = {
    val r = send(get(tableUri(id)))
    if (r.statusCode() == 404) return None
    if (r.statusCode() != 200) throw new IllegalStateException(
      s"loadTable(${id.fqName}) failed: HTTP ${r.statusCode()} ${r.body()}")
    val n = Jsons.mapper.readTree(r.body())
    val metadataLocation =
      Option(n.get("metadata-location")).map(_.asText()).getOrElse("")
    val location = Option(n.get("metadata"))
      .flatMap(m => Option(m.get("location"))).map(_.asText())
      .getOrElse("")
    Some(CatalogTableDef(
      identifier = id,
      location = location,
      tableFormat = "ICEBERG",
      columns = Nil, partitionColumns = Nil,
      inputFormat = "", outputFormat = "", serde = "",
      properties = Map(
        "table_type" -> "ICEBERG",
        "metadata_location" -> metadataLocation)))
  }

  private def metadataLocationOf(table: CatalogTableDef): String =
    table.properties.getOrElse("metadata_location",
      throw new IllegalArgumentException(
        "REST registration needs properties(\"metadata_location\") — " +
          "the Iceberg builder supplies it"))

  private def register(table: CatalogTableDef, overwrite: Boolean): Unit = {
    val n = table.identifier
    val o = Jsons.mapper.createObjectNode()
    o.put("name", n.table)
    o.put("metadata-location", metadataLocationOf(table))
    if (overwrite) o.put("overwrite", true)
    val r = send(post(s"${nsUri(n.database)}/register",
      Jsons.mapper.writeValueAsString(o)))
    if (r.statusCode() != 200) throw new IllegalStateException(
      s"register(${table.identifier.fqName}, overwrite=$overwrite) " +
        s"failed: HTTP ${r.statusCode()} ${r.body()}")
  }

  /** Fails if the table exists (HTTP 409 surfaces as the error) —
    * the catalog stays the authority, as with Glue/HMS create.
    */
  override def createTable(table: CatalogTableDef): Unit =
    register(table, overwrite = false)

  override def refreshTable(table: CatalogTableDef): Unit =
    register(table, overwrite = true)

  override def createOrReplaceTable(table: CatalogTableDef): Unit =
    register(table, overwrite = true)

  override def dropTable(id: CatalogTableIdentifier): Unit = {
    val r = send(HttpRequest.newBuilder(URI.create(tableUri(id))).DELETE())
    if (r.statusCode() != 204 && r.statusCode() != 200 &&
        r.statusCode() != 404)
      throw new IllegalStateException(
        s"dropTable(${id.fqName}) failed: HTTP ${r.statusCode()} ${r.body()}")
  }

  /** Iceberg REST catalogs carry partitioning INSIDE table metadata —
    * there is no Hive partition plane; sync treats the registration as
    * complete once the pointer lands.
    */
  override def listPartitions(id: CatalogTableIdentifier): Seq[CatalogPartition] = Nil
  override def addPartitions(id: CatalogTableIdentifier,
      parts: Seq[CatalogPartition]): Unit = ()
  override def dropPartitions(id: CatalogTableIdentifier,
      values: Seq[Seq[String]]): Unit = ()
}

object IcebergRestCatalogClient {

  /** Resolve a table BY NAME through a REST catalog to its storage
    * location — the CatalogConversionSource analog over the wire client:
    * `spark.read.format("graft").option("restCatalog", uri)
    * .option("table", "ns.t")` routes here instead of taking a path.
    * The LAST dot splits namespace from table (multi-level namespaces
    * keep their inner dots).
    */
  def resolveLocation(baseUri: String, fqName: String): String = {
    val cut = fqName.lastIndexOf('.')
    require(cut > 0 && cut < fqName.length - 1,
      s"REST table name must be <namespace>.<table>, got '$fqName'")
    val id = CatalogTableIdentifier(
      fqName.substring(0, cut), fqName.substring(cut + 1))
    val client = new IcebergRestCatalogClient(baseUri)
    val t = client.getTable(id).getOrElse(throw new NoSuchElementException(
      s"no table $fqName in REST catalog at $baseUri"))
    require(t.location.nonEmpty,
      s"REST catalog at $baseUri returned no location for $fqName")
    graft.util.PathUtils.canonical(t.location)
  }
}

/** In-process Iceberg REST catalog SERVER (JDK HttpServer on loopback):
  * spec-shaped endpoints over an in-memory namespace/table store, with
  * `LoadTableResponse` embedding the actual metadata JSON read from the
  * registered metadata-location. Exists so the REST client above is
  * exercised over a REAL socket — request/response bytes on the wire —
  * rather than in-process method calls.
  *
  * Implements: GET /v1/config, GET|POST namespaces, GET namespace,
  * POST namespaces/{ns}/register (incl. `overwrite`),
  * GET|DELETE namespaces/{ns}/tables/{t}. Errors use the spec's
  * ErrorModel envelope.
  */
class IcebergRestCatalogServer {
  import com.sun.net.httpserver.{HttpExchange, HttpServer}

  private val namespaces = scala.collection.mutable.Set.empty[String]
  private val tables =
    scala.collection.mutable.Map.empty[(String, String), String] // → metadata-location
  @volatile var requestCount: Int = 0

  private val server =
    HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)

  def port: Int = server.getAddress.getPort
  def baseUri: String = s"http://127.0.0.1:$port"

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  private def error(ex: HttpExchange, code: Int, typ: String,
      msg: String): Unit = {
    val o = Jsons.mapper.createObjectNode()
    val e = o.putObject("error")
    e.put("message", msg); e.put("type", typ); e.put("code", code)
    respond(ex, code, Jsons.mapper.writeValueAsString(o))
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  server.createContext("/v1/", (ex: HttpExchange) => try {
    requestCount += 1
    // segments arrive percent-encoded; split the RAW path (so a %2F
    // inside an identifier cannot corrupt segmentation), decode each
    // segment EXACTLY once, then fold the spec's %1F multi-level-
    // namespace separator back to the stored dotted form. getPath would
    // pre-decode, and a second URLDecoder pass then eats '+' and throws
    // on a literal '%' — the r14 double-decode bug.
    val path = ex.getRequestURI.getRawPath.stripPrefix("/v1/")
      .split("/").filter(_.nonEmpty)
      .map(seg => java.net.URLDecoder.decode(seg, StandardCharsets.UTF_8)
        .replace('\u001f', '.'))
      .toList
    val method = ex.getRequestMethod
    (method, path) match {
      case ("GET", "config" :: Nil) =>
        respond(ex, 200, """{"defaults":{},"overrides":{}}""")
      case ("POST", "namespaces" :: Nil) => this.synchronized {
        val n = Jsons.mapper.readTree(readBody(ex))
        val ns = n.get("namespace").elements().asScala
          .map(_.asText()).mkString(".")
        if (namespaces.contains(ns))
          error(ex, 409, "AlreadyExistsException", s"namespace $ns exists")
        else {
          namespaces += ns
          respond(ex, 200,
            s"""{"namespace":["$ns"],"properties":{}}""")
        }
      }
      case ("GET", "namespaces" :: ns :: Nil) => this.synchronized {
        if (namespaces.contains(ns))
          respond(ex, 200, s"""{"namespace":["$ns"],"properties":{}}""")
        else error(ex, 404, "NoSuchNamespaceException", s"no namespace $ns")
      }
      case ("POST", "namespaces" :: ns :: "register" :: Nil) =>
        this.synchronized {
          if (!namespaces.contains(ns))
            error(ex, 404, "NoSuchNamespaceException", s"no namespace $ns")
          else {
            val n = Jsons.mapper.readTree(readBody(ex))
            val name = n.get("name").asText()
            val overwrite =
              Option(n.get("overwrite")).exists(_.asBoolean(false))
            if (tables.contains((ns, name)) && !overwrite)
              error(ex, 409, "AlreadyExistsException",
                s"table $ns.$name exists")
            else {
              tables((ns, name)) = n.get("metadata-location").asText()
              loadResponse(ex, ns, name)
            }
          }
        }
      case ("GET", "namespaces" :: ns :: "tables" :: t :: Nil) =>
        this.synchronized {
          if (!tables.contains((ns, t)))
            error(ex, 404, "NoSuchTableException", s"no table $ns.$t")
          else loadResponse(ex, ns, t)
        }
      case ("DELETE", "namespaces" :: ns :: "tables" :: t :: Nil) =>
        this.synchronized {
          if (tables.remove((ns, t)).isDefined) respond(ex, 204, "")
          else error(ex, 404, "NoSuchTableException", s"no table $ns.$t")
        }
      case _ =>
        error(ex, 404, "NotFoundException",
          s"$method /v1/${path.mkString("/")}")
    }
  } catch {
    case e: Exception =>
      error(ex, 500, "InternalServerError", String.valueOf(e.getMessage))
  })

  /** LoadTableResponse: metadata-location + the metadata JSON itself,
    * read from the registered location (the spec requires the server to
    * serve the metadata content, not just the pointer).
    */
  private def loadResponse(ex: HttpExchange, ns: String,
      name: String): Unit = {
    val loc = tables((ns, name))
    val metaJson = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(graft.util.PathUtils.canonical(loc))),
      StandardCharsets.UTF_8)
    val o = Jsons.mapper.createObjectNode()
    o.put("metadata-location", loc)
    o.set[com.fasterxml.jackson.databind.JsonNode]("metadata",
      Jsons.mapper.readTree(metaJson))
    o.putObject("config")
    respond(ex, 200, Jsons.mapper.writeValueAsString(o))
  }

  def start(): this.type = { server.start(); this }
  def stop(): Unit = server.stop(0)
}
