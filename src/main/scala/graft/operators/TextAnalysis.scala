package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.rolling_hash

/** Text-analysis operators for training-data pipelines: quality features,
  * token counting, language ID, document fingerprinting. All column
  * expressions (codegen'd) — rolling_hash is a native Catalyst expression.
  */
object TextAnalysis {

  /** Occurrences of a literal substring, via the replace-length identity
    * (chosen because it computes identically in any ANSI SQL engine —
    * the oracle mirrors it verbatim).
    */
  def countOccurrences(text: Column, lit0: String): Column =
    ((length(text) - length(replace(text, lit(lit0), lit("")))) /
      lit0.length).cast("long")

  /** Quality features per document — every column is reproducible exactly
    * in ANSI SQL (no regex dialect dependence).
    */
  def qualityFeatures(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nTokens = (length(t) - length(replace(t, lit(" "), lit(""))) + 1)
      .cast("long")
    val nPeriods = countOccurrences(t, ".")
    val nCommas = countOccurrences(t, ",")
    val nThe = countOccurrences(t, " the ")
    docs.select(
      col(idCol),
      nChars.as("n_chars"),
      nTokens.as("n_tokens"),
      nPeriods.as("n_periods"),
      nCommas.as("n_commas"),
      nThe.as("n_the"),
      (nChars.cast("double") / nTokens.cast("double")).as("avg_token_len"),
      ((nPeriods + nCommas).cast("double") / nChars.cast("double"))
        .as("punct_ratio"),
      (nThe.cast("double") / nTokens.cast("double")).as("stopword_ratio"))
      .orderBy(idCol)
  }

  /** Stopword profiles for the language-ID heuristic (top function words;
    * public-knowledge lists).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "los", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une", "du", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"))

  /** N-gram/stopword language ID: score = fraction of tokens found in each
    * language's stopword set; argmax with deterministic tie-break (language
    * code order). Unknown when no stopword hits.
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = split(lower(col(textCol)), "\\s+")
    val scores = stopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      val swArr = array(sw.map(lit): _*)
      struct(size(array_intersect(array_distinct(words), swArr))
        .cast("double").as("score"), lit(lang).as("lang"))
    }
    // argmax: sort (score desc, lang asc) and take first
    val best = element_at(
      reverse(array_sort(array(scores: _*))), 1)
    docs.select(col(idCol),
        when(best.getField("score") > 0, best.getField("lang"))
          .otherwise(lit("und")).as("predicted_lang"))
      .orderBy(idCol)
  }

  /** BPE-ish token count: word pieces + standalone punctuation (regex). */
  def bpeishTokenCount(text: Column): Column =
    size(expr(s"regexp_extract_all(${text.toString}, '[a-z0-9]+|[^a-z0-9\\\\s]', 0)"))
      .cast("long")

  /** Deterministic content-hash split assignment for train/eval carving:
    * stable across runs, engines, and partitionings (keyed on md5 of the
    * content, not on row order or RNG state) — the property a reproducible
    * training-data pipeline needs.
    */
  def splitAssignment(text: Column, evalOneIn: Int = 4): Column =
    when(ascii(substring(md5(text), 1, 1)) % evalOneIn === 0, lit("eval"))
      .otherwise(lit("train"))

  /** Rolling-hash fingerprint per document (native Catalyst expression) +
    * duplicate-group size per fingerprint.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val normalized = lower(regexp_replace(col(textCol), "\\s+", " "))
    val fp = docs.select(col(idCol),
      rolling_hash(normalized).as("fingerprint"),
      bpeishTokenCount(col(textCol)).as("n_bpeish_tokens"))
    fp.withColumn("group_size",
        count(lit(1)).over(Window.partitionBy("fingerprint")))
      .orderBy(idCol)
  }
}
