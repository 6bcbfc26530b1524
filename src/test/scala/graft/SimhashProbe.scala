package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev probe: where does COLD dedup_simhash time go (no cross-query cache
  * reuse)? Run: sbt "Test/runMain graft.SimhashProbe"
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.session
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("shingleSets count")(Dedup.shingleSets(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    t("simhash sigs")(Dedup.shingleSets(docs, "doc_id", "text")
      .select(graft.functions.SketchFunctions.simhash64(col("shingles")))
      .count())
    spark.catalog.clearCache()
    t("simHash pairs COLD")(Dedup.simHash(docs, "doc_id", "text").count())
    spark.catalog.clearCache()
    val g = Dedup.shingleSets(docs, "doc_id", "text")
      .select(col("doc"), array_sort(col("shingles")).as("key"))
    t("ident self-join COLD")(g.as("a").join(g.as("b"),
        col("a.key") === col("b.key") && col("a.doc") < col("b.doc")).count())
    spark.catalog.clearCache()
    // how many raw candidate pairs does the chunk join emit?
    val sigs = Dedup.shingleSets(docs, "doc_id", "text")
      .select(col("doc"),
        graft.functions.SketchFunctions.simhash64(col("shingles")).as("simhash"))
    val chunks = sigs.select(col("doc"), col("simhash"),
      explode(array((0 until 4).map(c => struct(lit(c).as("c"),
        shiftrightunsigned(col("simhash"), 16 * c).bitwiseAND(0xFFFF)
          .as("v"))): _*)).as("ck"))
      .select(col("doc"), col("simhash"), col("ck.c"), col("ck.v"))
    t("raw candidate pairs")(chunks.as("x").join(chunks.as("y"),
      col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
        col("x.doc") < col("y.doc")).count())
    spark.catalog.clearCache()
    val cand = chunks.as("x").join(chunks.as("y"),
      col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
          .as("hamming"))
    t("cand+hamming")(cand.count())
    spark.catalog.clearCache()
    t("cand+hamming+distinct")(cand.distinct().count())
    spark.catalog.clearCache()
    t("cand+distinct+filter+orderBy")(cand.distinct()
      .filter(col("hamming") <= 3).orderBy("doc_a", "doc_b").count())
    spark.catalog.clearCache()
    t("ident join AGAIN")(g.as("a").join(g.as("b"),
        col("a.key") === col("b.key") && col("a.doc") < col("b.doc")).count())
    spark.stop()
  }
}
