package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class IvfSpec extends SparkSuite {

  test("IVF pairs are a high-recall subset of exact pairs") {
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    // exact ground truth at threshold 0.45 (brute-force all pairs)
    val v = emb.select(col("vec_id").as("doc"), col("embedding").as("ve"))
    val exact = v.as("a").join(v.as("b"), col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        Similarity.cosine(col("a.ve"), col("b.ve")).as("s"))
      .filter(col("s") >= 0.45)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ivf = Similarity.ivfNearPairs(emb, "vec_id", "embedding", dim = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ivf.subsetOf(exact))           // exact-verified, no false positives
    assert(exact.nonEmpty)
    val recall = ivf.size.toDouble / exact.size
    info(f"IVF recall at 0.45: ${ivf.size}/${exact.size} = $recall%.2f")
    assert(recall >= 0.5, s"recall $recall too low")
    // deterministic across runs
    val again = Similarity.ivfNearPairs(emb, "vec_id", "embedding", dim = 64)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == ivf)
  }
}
