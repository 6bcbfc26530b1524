package graft.util

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Shared Jackson mapper (jackson + scala module ship with Spark). */
object Jsons {
  val mapper: ObjectMapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def toJson(v: Any): String = mapper.writeValueAsString(v)
  def parseMap(s: String): Map[String, Any] =
    mapper.readValue(s, classOf[Map[String, Any]])
}
