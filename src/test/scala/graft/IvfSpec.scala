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

  test("string doc ids work through IVF top-k and semantic dedup") {
    // pre-r6 the seed filter was pmod(doc, step): on string ids pmod is
    // null, the filter dropped every row, and fitting blew up far from
    // the cause — seeds are now hash-spaced (xxhash64)
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
      .withColumn("vec_id", concat(lit("doc-"), col("vec_id")))
    val queries = emb.filter(col("vec_id").rlike("^doc-[0-9]$"))
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5, nlist = 16, nprobe = 6).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
    val dropped = Similarity.semanticDedup(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.45, nlist = 8).collect()
    assert(dropped.nonEmpty)
    // rep is still the lexically-lower id
    dropped.foreach(r => assert(r.getString(1) < r.getString(0)))
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

  test("PQ top-k: exact-scored rerank, high recall, deterministic") {
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet"))
    val queries = emb.filter(col("vec_id") < 10)
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5).collect()
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      k = 5).collect()

    // per query: <= k rows, contiguous ranks, sims non-increasing
    pq.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val byRank = rs.sortBy(_.getInt(3))
      assert(byRank.map(_.getInt(3)).toSeq == (1 to rs.length))
      val sims = byRank.map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // the rerank scores exactly: any (q, n) also in exact top-k matches
    val exactScore = exact.map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      exactScore.get((r.getLong(0), r.getLong(1)))
        .foreach(x => assert(x == r.getDouble(2)))
    }
    val pqSet = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pqSet intersect exactSet).size.toDouble / exactSet.size
    info(f"PQ top-k recall: $recall%.2f")
    assert(recall >= 0.75, s"recall $recall too low")
    // deterministic across runs (codebook fit has no RNG state)
    val again = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      dim = 64, k = 5).collect()
    assert(again.map(_.toString).toSeq == pq.map(_.toString).toSeq)
  }

  test("seed band widens on shortfall instead of under-filling (ADVICE r6)") {
    val emb = spark.read.parquet(sf("sf0.001/embeddings.parquet")).limit(50)
      .select(col("vec_id").as("doc"), col("embedding").as("v"))
    // step=1000 over 50 rows: the initial <2 hash band expects 0.1 rows —
    // a guaranteed shortfall; widening must still return a full seed set
    val seeds = Similarity.seedVectors(emb, target = 16, step = 1000L)
    assert(seeds.length == 16)
    assert(seeds.forall(_.length == 64))
    // deterministic: same widening path, same rows
    val again = Similarity.seedVectors(emb, target = 16, step = 1000L)
    assert(again.map(_.toSeq).toSeq == seeds.map(_.toSeq).toSeq)
    // corpus smaller than target: returns every row rather than failing
    val tiny = emb.limit(5)
    assert(Similarity.seedVectors(tiny, target = 16, step = 1000L).length == 5)
  }

  test("PQ encode/lut/adc kernels agree with a scala recompute") {
    import spark.implicits._
    val dim = 8; val m = 2; val dsub = 4; val ksub = 2
    val books = Array(
      Array(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0)),
      Array(Array(0.0, 0.0, 0.0, 1.0), Array(0.5, 0.5, 0.5, 0.5)))
    val rows = Seq(
      (1L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0.8f)),
      (2L, Array(0.1f, 0.9f, 0f, 0f, 0.4f, 0.4f, 0.4f, 0.4f)))
      .toDF("id", "v")
    val out = rows.select(col("id"),
        graft.functions.PqExpressions.encode(col("v"), books).as("codes"),
        graft.functions.PqExpressions.adc(
          graft.functions.PqExpressions.lut(col("v"), books),
          graft.functions.PqExpressions.encode(col("v"), books), ksub)
          .as("selfAdc"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1), r.getDouble(2)))
      .sortBy(_._1)
    // row 1: sub0 nearest (1,0,0,0) → 0; sub1 nearest (0,0,0,1) → 0
    assert(out(0)._2 == Seq(0, 0))
    // row 2: sub0 nearest (0,1,0,0) → 1; sub1 nearest (.5,.5,.5,.5) → 1
    assert(out(1)._2 == Seq(1, 1))
    // ADC of a vector against its own codes = Σ dot(sub_j, book[j][code_j])
    def dotd(a: Array[Double], b: Array[Float], off: Int) =
      a.indices.map(i => a(i) * b(off + i)).sum
    val v1 = Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0.8f)
    val expected1 = dotd(books(0)(0), v1, 0) + dotd(books(1)(0), v1, 4)
    assert(math.abs(out(0)._3 - expected1) < 1e-12)
  }
}
