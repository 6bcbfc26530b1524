package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{Funnel, TextAnalysis}

/** Property-style invariants for the round-5 text/event operators: a
  * seeded random corpus goes through the DataFrame operator ONCE, and
  * every row is checked against an independent local Scala recompute —
  * the same law-based approach as CodecPropertySpec, shaped to avoid one
  * Spark job per generated case.
  */
class PipelinePropertySpec extends SparkSuite {

  private val rnd = new Random(42)
  private val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "g", "hh")

  private def randomDoc(): String =
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      .mkString(sep = " " * (1 + rnd.nextInt(2)))   // runs of spaces too

  private def toks(text: String): Seq[String] =
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  test("chunking law: operator output == local recompute on random docs") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, randomDoc())).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "doc_id", "text",
        chunkTokens = 5, overlap = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    val local = docs.collect().flatMap { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val w = toks(text)
      if (w.isEmpty) Nil
      else {
        val starts = 1 to math.max(w.length - 2, 1) by 3
        starts.zipWithIndex.map { case (s, i) =>
          val chunk = w.slice(s - 1, s - 1 + 5)
          val hash = java.security.MessageDigest.getInstance("MD5")
            .digest(chunk.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          (id, i + 1) -> (chunk.length.toLong, hash)
        }
      }
    }.toMap
    assert(out == local)
  }

  test("funnel law: stage counts are non-increasing on random event logs") {
    import spark.implicits._
    import java.sql.Timestamp
    val types = Seq("s1", "s2", "s3", "noise")
    val events = (1 to 400).map { i =>
      (rnd.nextInt(30).toLong, types(rnd.nextInt(types.size)),
        new Timestamp(rnd.nextInt(100000).toLong))
    }.toDF("user_id", "event_type", "ts")
    val out = Funnel.stageCounts(events, "user_id", "event_type", "ts",
        Seq("s1", "s2", "s3"))
      .collect().map(_.getLong(2)).toSeq
    assert(out.length == 3)
    assert(out.zip(out.tail).forall { case (a, b) => a >= b },
      s"stage counts increased: $out")
    // stage 1 is exactly the distinct users with an s1 event
    val s1Users = events.filter(col("event_type") === "s1")
      .select("user_id").distinct().count()
    assert(out.head == s1Users)
  }

  test("contamination law: flagged docs truly share a gram; counts match") {
    import spark.implicits._
    val all = (1L to 80L).map(i => (i, randomDoc())).toDF("doc_id", "text")
    val evalDocs = all.filter(col("doc_id") % 7 === 0)
    val train = all.filter(col("doc_id") % 7 =!= 0)
    val out = TextAnalysis.contamination(train, evalDocs, "doc_id", "text",
        n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def grams(text: String): Set[String] = {
      val w = toks(text)
      if (w.length < 2) Set.empty
      else w.sliding(2).map(_.mkString(" ")).toSet
    }
    val evalGrams = evalDocs.collect()
      .flatMap(r => grams(r.getString(1))).toSet
    val local = train.collect().flatMap { r =>
      val shared = grams(r.getString(1)) intersect evalGrams
      if (shared.isEmpty) None else Some(r.getLong(0) -> shared.size.toLong)
    }.toMap
    assert(out == local)
  }

  test("dup-gram law: profile equals local recompute") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, randomDoc())).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateGramStats(docs, "doc_id", "text", n = 2)
      .collect().head
    val perDoc = docs.collect().map { r =>
      val w = toks(r.getString(1))
      if (w.length < 2) Set.empty[String]
      else w.sliding(2).map(_.mkString(" ")).toSet
    }
    val counts = perDoc.flatten.groupBy(identity).map { case (g, o) =>
      g -> perDoc.count(_.contains(g))
    }
    assert(out.getLong(0) == counts.size.toLong)
    assert(out.getLong(1) == counts.values.count(_ > 1).toLong)
    assert(out.getLong(2) == counts.values.max.toLong)
  }
}
