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
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val e0 = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
        Similarity.norm(col("embedding")).as("nv")).cache()
      val exactPairs = e0.as("a").join(e0.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          round(Similarity.cosineWithNorms(
            Similarity.dot(col("a.v"), col("b.v")),
            col("a.nv"), col("b.nv")), 3).as("c"))
        .filter(col("c") >= 0.45).select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = Similarity.lshNearPairs(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.45)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"$sf lsh pairs recall=" +
        f"${(lsh intersect exactPairs).size.toDouble /
          math.max(1, exactPairs.size)}%.3f " +
        s"(${(lsh intersect exactPairs).size}/${exactPairs.size})")
    }
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val e = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
        Similarity.norm(col("embedding")).as("nv")).cache()
      val droppable = e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
        .select(col("b.id").as("doc_id"),
          round(Similarity.cosineWithNorms(
            Similarity.dot(col("a.v"), col("b.v")),
            col("a.nv"), col("b.nv")), 4).as("c"))
        .filter(col("c") >= 0.45).select("doc_id").distinct().count()
      for (nprobe <- Seq(1, 2, 3)) {
        val dropped = Similarity.semanticDedup(emb, "vec_id", "embedding",
          dim = 64, threshold = 0.45, nlist = 16, nprobe = nprobe).count()
        println(f"$sf semdedup nprobe=$nprobe drops=$dropped/$droppable " +
          f"recall=${dropped.toDouble / math.max(1, droppable)}%.3f")
      }
    }
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); mm <- Seq(8, 16);
         rf <- Seq(8, 16)) {
      val ks = 64
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val queries = emb.filter(col("vec_id") < 5)
      val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
          dim = 64, k = 5, m = mm, ksub = ks, rerankFactor = rf)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
          "embedding", k = 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (pq intersect exact).size.toDouble / exact.size
      println(f"$sf pq m=$mm ksub=$ks rerank=$rf recall=$recall%.3f (${pq.size}/${exact.size})")
    }
    spark.stop()
  }
}
