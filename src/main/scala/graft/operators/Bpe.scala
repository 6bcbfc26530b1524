package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, arXiv 1508.07909)
  * trained DISTRIBUTED.
  *
  * Scale shape — the standard word-frequency factorization: training
  * operates on the DISTINCT-WORD table (word → corpus frequency), so
  * after one O(corpus) aggregation every merge iteration costs
  * O(|vocabulary|), independent of corpus size; a 100 TB corpus with a
  * 10^7-word vocabulary trains at the same per-iteration cost as a 1 GB
  * one. Each iteration is one pair-count aggregation (shuffle keyed on
  * the symbol pair) plus a one-row argmax collect; the symbol table is
  * re-persisted per iteration and checkpointed every 16 to keep the plan
  * linear. The argmax tie-break is (max count, then lexicographically
  * smallest pair) so training is deterministic on any cluster layout.
  *
  * Words follow the shared `\s+` lowercase tokenization
  * ([[TextAnalysis.whitespaceTokens]]) and carry the paper's explicit
  * end-of-word marker `</w>` as a final symbol, so word-final subwords
  * learn separately from word-internal ones.
  */
object Bpe {

  /** End-of-word marker (Sennrich et al. §3.2). */
  val Eow = "</w>"

  /** Distinct words of the corpus with frequencies — the training input
    * and the only O(corpus) pass in the pipeline.
    */
  def wordFrequencies(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(TextAnalysis.whitespaceTokens(col(textCol)))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  private def toSymbols(word: String): Seq[String] =
    word.map(_.toString) :+ Eow

  /** Learn `numMerges` merge rules. Returns them in rank order (rank 0 =
    * first learned); stops early when no adjacent pair occurs twice.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int)
      : Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words: Dataset[(Seq[String], Long)] =
      wordFrequencies(docs, textCol).as[(String, Long)]
        .map { case (w, f) => (toSymbols(w), f) }
        .persist()
    words.count()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = words.flatMap { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, f))
      }.toDF("a", "b", "f")
        .groupBy("a", "b").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val prev = words
        words = prev
          .map { case (syms, f) => (mergePair(syms, a, b), f) }
          .persist()
        if ((i + 1) % 16 == 0) words = words.localCheckpoint()
        else words.count()
        prev.unpersist()
      }
      i += 1
    }
    words.unpersist()
    merges.result()
  }

  /** Replace every adjacent (a, b) with the fused symbol, one
    * left-to-right pass (the paper's merge step).
    */
  private[graft] def mergePair(syms: Seq[String], a: String,
      b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    val v = syms.toIndexedSeq
    while (i < v.length) {
      if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += v(i)
        i += 1
      }
    }
    out.result()
  }

  /** Encode one word: repeatedly merge the present pair with the LOWEST
    * training rank until none applies. Equivalent to replaying the merge
    * list in rank order (a merge's output pairs always rank later than
    * the merge itself, since their symbols could not exist before it).
    */
  private[graft] def encodeWord(word: String,
      rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = toSymbols(word).toVector
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++
          syms.drop(bi + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Tokenize a corpus under a trained merge list: per document,
    * (n_words, n_bpe_tokens). The merge table broadcasts (it is
    * vocabulary-sized); the pass is embarrassingly parallel — per-word
    * imperative subword merging is the one shape a column expression
    * cannot express, so this is a typed map, not a UDF-in-SQL.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val brank = spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
    docs.select(col(idCol).cast("long"),
        TextAnalysis.whitespaceTokens(col(textCol)))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val r = brank.value
        var nTok = 0L
        ws.foreach(w => nTok += encodeWord(w, r).length)
        (id, ws.length.toLong, nTok)
      }
      .toDF(idCol, "n_words", "n_bpe_tokens")
  }
}
