package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.service.ConversionService

class ConversionServiceSpec extends SparkSuite {

  test("POST /v1/conversion/table converts and returns schema") {
    val svc = new ConversionService(spark).start()
    try {
      val target = tmpDir("svc_delta")
      val iceTarget = tmpDir("svc_ice")
      val hudiTarget = tmpDir("svc_hudi")
      val body =
        s"""{"tableName":"region","sourceFormat":"PARQUET",
           |"sourcePath":"${sf("sf0.001/region.parquet")}",
           |"targets":[{"format":"DELTA","path":"$target"},
           |  {"format":"ICEBERG","path":"$iceTarget"},
           |  {"format":"HUDI","path":"$hudiTarget"}]}""".stripMargin
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:${svc.boundPort}/v1/conversion/table"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val n = graft.util.Jsons.mapper.readTree(resp.body())
      val ct = n.get("convertedTables")
      assert(ct.size() == 3)
      // per-target schemas come back in each format's NATIVE string form
      val delta = ct.get(0)
      assert(delta.get("status").asText == "SUCCESS", resp.body())
      assert(delta.get("targetSchema").asText.contains("r_regionkey"))
      assert(delta.get("targetSchema").asText.contains("\"type\":\"struct\""))
      assert(delta.get("targetMetadataPath").asText.endsWith("_delta_log"))
      val ice = ct.get(1)
      assert(ice.get("targetSchema").asText.contains("\"fields\""))
      assert(ice.get("targetSchema").asText.contains("\"id\""))   // field ids
      assert(ice.get("targetMetadataPath").asText.endsWith("metadata"))
      val hudi = ct.get(2)
      assert(hudi.get("targetSchema").asText.contains("\"type\":\"record\""))
      assert(hudi.get("targetMetadataPath").asText.endsWith(".hoodie"))

      // bad method and bad body are rejected cleanly
      val get = HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:${svc.boundPort}/v1/conversion/table"))
        .GET().build()
      assert(client.send(get, HttpResponse.BodyHandlers.ofString())
        .statusCode() == 405)
      val bad = HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:${svc.boundPort}/v1/conversion/table"))
        .POST(HttpRequest.BodyPublishers.ofString("{}")).build()
      assert(client.send(bad, HttpResponse.BodyHandlers.ofString())
        .statusCode() == 400)
    } finally svc.stop()
  }
}
