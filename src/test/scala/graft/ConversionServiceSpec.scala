package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.service.ConversionService

class ConversionServiceSpec extends SparkSuite {

  test("POST /v1/conversion/table converts and returns schema") {
    val svc = new ConversionService(spark).start()
    try {
      val target = tmpDir("svc_delta")
      val body =
        s"""{"tableName":"region","sourceFormat":"PARQUET",
           |"sourcePath":"${sf("sf0.001/region.parquet")}",
           |"targets":[{"format":"DELTA","path":"$target"}]}""".stripMargin
      val client = HttpClient.newHttpClient()
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"http://localhost:${svc.boundPort}/v1/conversion/table"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val n = graft.util.Jsons.mapper.readTree(resp.body())
      val o = n.get("outcomes").get(0)
      assert(o.get("status").asText == "SUCCESS", resp.body())
      assert(o.get("schemaString").asText.contains("r_regionkey"))

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
