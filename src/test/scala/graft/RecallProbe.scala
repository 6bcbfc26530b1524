package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Dev probe: measured IVF top-k recall per sf/nprobe — sets honest gate
  * floors. Run: sbt "Test/runMain graft.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.session
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); nprobe <- Seq(2, 4, 6)) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 5)
      val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          dim = 64, k = 5, nlist = 16, nprobe = nprobe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (ivf intersect exact).size.toDouble / exact.size
      println(f"$sf nprobe=$nprobe recall=$recall%.3f (${ivf.size}/${exact.size})")
    }
    spark.stop()
  }
}
