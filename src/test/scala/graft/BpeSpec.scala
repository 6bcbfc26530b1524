package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer: the distributed trainer must agree EXACTLY with a
  * self-contained single-node reference implementation (written here,
  * from the Sennrich et al. 2016 paper's algorithm 1), and encoding must
  * reconstruct its input.
  */
class BpeSpec extends SparkSuite {

  /** Single-node reference trainer — same tie-break (max count, then
    * lexicographically smallest pair), same end-of-word marker.
    */
  private def refTrain(wordFreq: Map[String, Long], numMerges: Int)
      : Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] = wordFreq.map { case (w, f) =>
      (w.map(_.toString) :+ Bpe.Eow, f)
    }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var stop = false
    while (i < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val ranked = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }
      if (ranked.isEmpty || ranked.head._2 < 2) stop = true
      else {
        val (a, b) = ranked.head._1
        merges += ((a, b))
        vocab = vocab.toSeq
          .map { case (syms, f) => (Bpe.mergePair(syms, a, b), f) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
      i += 1
    }
    merges.result()
  }

  test("first merge on the paper's example vocabulary is (e, s)") {
    import spark.implicits._
    // Sennrich et al. 2016 §3.2 example: low×5 lower×2 newest×6 widest×3
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 4)
    // pair counts tie at 9 for (e,s), (s,t), (t,</w>) — lexicographic
    // tie-break picks (e,s); the chain then merges es+t and est+</w>
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", Bpe.Eow)),
      merges.toString)
  }

  test("distributed trainer matches the single-node reference exactly") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val wf = Bpe.wordFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = refTrain(wf, numMerges = 40)
    val got = Bpe.train(docs, "text", numMerges = 40)
    assert(got == expect,
      s"first divergence at rank ${got.zip(expect).indexWhere(p => p._1 != p._2)}: got $got\nexpected $expect")
  }

  test("encoding reconstructs every word and shrinks monotonically") {
    val docs = spark.read.parquet(sf("sf0.001/documents.parquet"))
    val merges = Bpe.train(docs.limit(200), "text", numMerges = 60)
    val rank = merges.zipWithIndex.toMap
    val words = Bpe.wordFrequencies(docs, "text").limit(500).collect()
      .map(_.getString(0))
    words.foreach { w =>
      val toks = Bpe.encodeWord(w, rank)
      assert(toks.mkString == w + Bpe.Eow, s"round-trip broke for '$w': $toks")
    }
    // more merges never grow a word's token count
    val rank20 = merges.take(20).zipWithIndex.toMap
    words.foreach { w =>
      assert(Bpe.encodeWord(w, rank).length <=
        Bpe.encodeWord(w, rank20).length, s"token count grew for '$w'")
    }
    // corpus-level encode: one row per doc, token total bounded by
    // chars+words (no merges can do worse than char-level + EOW)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
    assert(enc.count() == docs.count())
    val tot = enc.agg(sum("n_bpe_tokens"), sum("n_words")).head()
    assert(tot.getLong(0) > 0L && tot.getLong(0) >= tot.getLong(1))
  }

  test("training cost is vocabulary-sized, not corpus-sized") {
    import spark.implicits._
    // 50k docs over a 100-word vocabulary: the per-iteration symbol table
    // must hold exactly 100 rows no matter how many documents exist
    val docs = spark.range(50000).select(
      concat_ws(" ", transform(sequence(lit(0), lit(9)),
        i => concat(lit("w"), pmod(xxhash64(col("id"), i), lit(100)))))
        .as("text"))
    val wf = Bpe.wordFrequencies(docs, "text")
    assert(wf.count() == 100L)
    val merges = Bpe.train(docs, "text", numMerges = 10)
    assert(merges.size == 10)
  }
}
