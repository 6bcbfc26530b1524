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

  test("IVF top-k serves ranked exact-scored neighbors with bounded loss") {
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val queries = emb.filter(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, nlist = 16, nprobe = 6).collect()
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      k = 5).collect()

    // per query: <= k rows, contiguous ranks, sims non-increasing
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rs.length))
      val sims = byRank.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // every ivf hit that IS in the exact top-k carries the same score
    val exactScore = exact.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      exactScore.get((r.getLong(0), r.getLong(1)))
        .foreach(x => assert(x == r.getDouble(2)))
    }
    // recall vs brute force at nprobe=6/nlist=16
    val ivfSet = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivfSet intersect exactSet).size.toDouble / exactSet.size
    info(f"IVF top-k recall: $recall%.2f")
    assert(recall >= 0.6, s"recall $recall too low")
    // deterministic across runs
    val again = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, nlist = 16, nprobe = 6).collect()
    assert(again.map(_.toString).toSeq == ivf.map(_.toString).toSeq)
  }
}
