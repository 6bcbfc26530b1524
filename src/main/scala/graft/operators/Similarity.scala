package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast
  * against the corpus — one pass, no shuffle of the corpus. Scale path:
  * random-hyperplane LSH bucketing so each query only scores its bucket.
  * All arithmetic via codegen'd higher-order functions (zip_with +
  * aggregate) — no UDFs in the hot path.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double — a
    * native expression (one tight loop per pair) with the identical
    * floating-point sequence as the `zip_with`+`aggregate` form it
    * replaces, so results are bit-for-bit unchanged.
    */
  def dot(a: Column, b: Column): Column = graft.functions.DotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms. `cosine(a,b)` evaluates THREE dot
    * products per pair; on a quadratic pair stage that triples the flops.
    * Precomputing `norm(v)` once per row and dividing here keeps the exact
    * same float-op sequence per value — `dot(a,b) / (na * nb)` with
    * `n? = sqrt(dot(v,v))` — so results are bit-for-bit identical.
    */
  def cosineWithNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded). Queries are broadcast; ranking uses rounded
    * similarity with id tie-breaks so results are deterministic at any
    * parallelism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    // 3-decimal rounding: DuckDB's SIMD float32 cosine and our ordered
    // double accumulation agree to ~1e-7, far from any 5e-4 boundary
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineWithNorms(dot(col("qv"), col("cv")), col("qn"),
          col("cn")), 3).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** Deterministic pseudo-random hyperplanes via SplitMix64 (no RNG state,
    * reproducible across runs/executors).
    */
  private def splitMix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def hyperplane(planeIdx: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val h = splitMix64(planeIdx.toLong * 1000003L + d)
      (h.toDouble / Long.MaxValue)        // in [-1, 1]
    }

  /** Fit IVF centroids over a cached (doc, v, nv) frame: seed at evenly
    * spaced ids, one deterministic Lloyd refinement. Two Spark passes; the
    * only collect is nlist×dim aggregate rows (the index, not the data).
    */
  /** Deterministic seed rows: a hash-band sample over xxhash64(id) — no
    * global shuffle, string-id-safe, order-unbiased. The initial `< 2` band
    * expects ≈ 2×target candidates, but an unlucky hash draw can under-fill
    * it; rather than silently fitting fewer centroids than requested
    * (degraded recall with no signal), the band widens geometrically until
    * the target is met or the filter passes everything. orderBy+limit
    * compiles to TakeOrderedAndProject (per-partition top-k), so even the
    * fully-open fallback never global-sorts the corpus.
    */
  private[graft] def seedVectors(vecs: DataFrame, target: Int, step: Long)
      : Array[Array[Double]] = {
    def sel(band: Long) =
      vecs.filter(pmod(xxhash64(col("doc")), lit(step)) < lit(band))
        .orderBy("doc").limit(target).collect()
        .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var band = 2L
    var seeds = sel(band)
    while (seeds.length < target && band < step) {
      band = math.min(step, band * 8)
      seeds = sel(band)
    }
    require(seeds.nonEmpty, "seed selection found no rows")
    seeds
  }

  private def fitCentroids(vecs: DataFrame, dim: Int, nlist: Int)
      : Array[Array[Double]] = {
    val n = vecs.count()
    val step = math.max(1L, n / nlist)

    def collectCentroids(assigned: DataFrame): Array[Array[Double]] =
      assigned.select(col("cluster"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cluster", "d").agg(avg(col("x")).as("m"))
        .collect()
        .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          val m = new Array[Double](dim)
          rows.foreach(r => m(r.getInt(1)) = r.getDouble(2))
          m
        }.toArray

    val seeds = seedVectors(vecs, nlist, step)
    // Lloyd iterations: assign to nearest centroid, recompute means — each
    // round is ONE Spark job; the collect is nlist×dim aggregate rows
    var centroids = seeds
    for (_ <- 1 to 2) {
      val assigned = vecs.withColumn("cluster",
        element_at(graft.functions.NearestCentroids(col("v"), centroids, 1), 1))
      centroids = collectCentroids(assigned)
    }
    centroids
  }

  /** IVF near-neighbor pairs — the clustered-corpus scale path: seed
    * centroids at evenly spaced ids, one deterministic Lloyd refinement,
    * then each vector joins its `nprobe` nearest inverted lists; pairs
    * sharing any list are verified with exact cosine. Centroid fitting is
    * two Spark passes; assignment is a native expression.
    */
  def ivfNearPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.45, nlist: Int = 16, nprobe: Int = 2)
      : DataFrame = {
    val vecs = df.select(col(idCol).as("doc"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv")).cache()
    val centroids = fitCentroids(vecs, dim, nlist)

    val banded = vecs.select(col("doc"),
        explode(graft.functions.NearestCentroids(col("v"), centroids, nprobe))
          .as("cluster"))
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .distinct()
    pairs
      .join(vecs.select(col("doc").as("id_a"), col("v").as("va"),
        col("nv").as("na")), Seq("id_a"))
      .join(vecs.select(col("doc").as("id_b"), col("v").as("vb"),
        col("nv").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineWithNorms(dot(col("va"), col("vb")), col("na"),
          col("nb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** IVF top-k — the query-serving shape of the inverted-file index: the
    * corpus lives in its nearest centroid's list; each QUERY probes its
    * `nprobe` nearest lists and ranks only those candidates by exact
    * cosine. Per query the work is O(probed-list sizes), not O(corpus) —
    * the reason IVF serves at 10^9 vectors. Recall is bounded by the probed
    * lists (a true neighbor in an unprobed list is missed), which is why
    * the gate checks the measured-recall contract, not list equality.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int = 5, nlist: Int = 16, nprobe: Int = 4)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = corpus.select(col(idCol).as("doc"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv")).cache()
    val centroids = fitCentroids(vecs, dim, nlist)
    // corpus: ONE list per vector (the index); queries: nprobe lists
    val listed = vecs.select(col("doc").as("neighbor_id"), col("v").as("cv"),
      col("nv").as("cn"),
      element_at(graft.functions.NearestCentroids(col("v"), centroids, 1), 1)
        .as("cluster"))
    val probed = queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"), norm(col(vecCol)).as("qn"),
        explode(graft.functions.NearestCentroids(col(vecCol), centroids,
          nprobe)).as("qcluster"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    listed.join(broadcast(probed),
        col("cluster") === col("qcluster") &&
          col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineWithNorms(dot(col("qv"), col("cv")), col("qn"),
          col("cn")), 3).as("sim"))
      // a corpus vector can match several probed lists of the same query
      .distinct()
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** Fit PQ sub-codebooks: deterministic id-spaced seeds, one Lloyd
    * refinement per subspace — all subspaces refined in ONE Spark job
    * (assign codes with the seed codebooks, then a (subspace, code, dim)
    * aggregation); the only collect is m×ksub×dsub aggregate rows (the
    * codebook, not the data).
    */
  private def fitCodebooks(vecs: DataFrame, dim: Int, m: Int, ksub: Int,
      iters: Int = 3): Array[Array[Array[Double]]] = {
    val dsub = dim / m
    val n = vecs.count()
    val step = math.max(1L, n / ksub)
    val seedRows = seedVectors(vecs, ksub, step)
    var books = Array.tabulate(m, ksub) { (j, c) =>
      seedRows(c % seedRows.length).slice(j * dsub, (j + 1) * dsub)
    }
    // each Lloyd round is ONE Spark job; the collect is m×ksub×dsub
    // aggregate rows (the codebook, not the data)
    for (_ <- 1 to iters) {
      // codes materialize BELOW the Generate: inlining pq_encode into the
      // posexplode projection would re-evaluate the O(dim·ksub) encode
      // once per exploded ELEMENT (64×) instead of once per row
      val refined = vecs
        .select(col("v"),
          graft.functions.PqExpressions.encode(col("v"), books).as("codes"))
        .select(col("codes"), posexplode(col("v")).as(Seq("d", "x")))
        .select((col("d") / dsub).cast("int").as("j"), col("d"), col("x"),
          element_at(col("codes"), (col("d") / dsub).cast("int") + 1)
            .as("code"))
        .groupBy("j", "code", "d").agg(avg(col("x")).as("mean"))
        .collect()
      val out = books.map(_.map(_.clone()))   // empty cells keep their seed
      refined.foreach { r =>
        val j = r.getInt(0)
        out(j)(r.getInt(1))(r.getInt(2) - j * dsub) = r.getDouble(3)
      }
      books = out
    }
    books
  }

  /** PQ top-k — the compressed-corpus serving shape (FAISS IndexPQ): the
    * corpus is held as m int8-range codes + one exact norm per vector
    * (m + 4 bytes instead of dim×4 — 32× smaller at dim=64/m=8, the
    * difference between a 100 TB corpus and a 3 TB in-memory scan), each
    * query builds one O(dim·ksub) lookup table, scans pairs at O(m), and
    * exact-reranks only the top `rerankFactor`·k ADC candidates (the full
    * vectors are touched for k·rerankFactor rows per query, not the
    * corpus). Recall is bounded by quantization error, so the gate checks
    * the measured-recall contract, not list equality; emitted scores are
    * exact by construction of the rerank.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int = 5, m: Int = 16, ksub: Int = 64,
      rerankFactor: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val vecs = corpus.select(col(idCol).as("doc"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv")).cache()
    val codebooks = fitCodebooks(vecs, dim, m, ksub)
    // the compressed index: codes + norm only (the scan never reads v)
    val coded = vecs.select(col("doc").as("neighbor_id"),
      graft.functions.PqExpressions.encode(col("v"), codebooks).as("codes"),
      col("nv").as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"),
      graft.functions.PqExpressions.lut(col(vecCol), codebooks).as("lut"))
    val wA = Window.partitionBy("query_id")
      .orderBy(col("approx").desc, col("neighbor_id"))
    // the scan shuffles only (query, neighbor, approx) — the query vector
    // rejoins at rerank, once per SHORTLIST row, not per scanned pair
    val candidates = coded.join(broadcast(q),
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (graft.functions.PqExpressions.adc(col("lut"), col("codes"), ksub) /
          (col("qn") * col("cn"))).as("approx"))
      .withColumn("arnk", row_number().over(wA))
      .filter(col("arnk") <= k * rerankFactor)
    // exact rerank of the shortlist only
    val wE = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    candidates
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))),
        Seq("query_id"))
      .join(vecs.select(col("doc").as("neighbor_id"), col("v").as("cv"),
        col("nv").as("cn")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosineWithNorms(dot(col("qv"), col("cv")), col("qn"),
          col("cn")), 3).as("sim"))
      .withColumn("rnk", row_number().over(wE))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }

  /** Semantic deduplication (SemDeDup-shape: Abbas et al. 2023, public
    * arXiv 2303.09540): cluster the embedding space, then prune near-
    * duplicates WITHIN each cluster — the clustering is what bounds the
    * quadratic: pair cost is Σ|cluster|², not n², and each cluster's pair
    * stage is an independent shuffle-partition-local problem at scale.
    *
    * The keep rule is greedy-by-id (deterministic at any parallelism): a
    * document is dropped iff a LOWER-id document sharing one of its
    * `nprobe` nearest clusters has cosine ≥ threshold; the emitted
    * representative is the smallest such id. Multi-probe assignment
    * (nprobe=2) recovers most boundary-straddling duplicate pairs that
    * single-assignment SemDeDup loses; truly cross-cluster duplicates are
    * the recall loss this trade accepts (the gate measures it against the
    * exact global answer).
    *
    * Output: one row per DROPPED doc — (doc_id, rep_id, cos_sim to the
    * representative). Exact cosine verifies every drop, so precision is 1
    * by construction; the gate still recomputes it independently.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.45, nlist: Int = 16, nprobe: Int = 2)
      : DataFrame = {
    val vecs = df.select(col(idCol).as("doc"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv")).cache()
    val centroids = fitCentroids(vecs, dim, nlist)
    val banded = vecs.select(col("doc"),
      explode(graft.functions.NearestCentroids(col("v"), centroids, nprobe))
        .as("cluster"))
    // bare id pairs deduped BEFORE touching vectors (a pair can share
    // several probed clusters) — same shape as ivfNearPairs
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("rep"), col("y.doc").as("doc_id"))
      .distinct()
    pairs
      .join(vecs.select(col("doc").as("rep"), col("v").as("va"),
        col("nv").as("na")), Seq("rep"))
      .join(vecs.select(col("doc").as("doc_id"), col("v").as("vb"),
        col("nv").as("nb")), Seq("doc_id"))
      .select(col("doc_id"), col("rep"),
        round(cosineWithNorms(dot(col("va"), col("vb")), col("na"),
          col("nb")), 4).as("cs"))
      .filter(col("cs") >= threshold)
      .groupBy("doc_id")
      .agg(min(struct(col("rep"), col("cs"))).as("r"))
      .select(col("doc_id"), col("r.rep").as("rep_id"),
        col("r.cs").as("cos_sim"))
      .orderBy("doc_id")
  }

  /** LSH-bucketed approximate near-neighbor pairs: `bands` bands of
    * `rowsPerBand` hyperplane sign bits each; pairs sharing any band bucket
    * are verified with exact cosine ≥ threshold. Band keys come from the
    * native HyperplaneBandKeys expression (one tight loop per row).
    */
  def lshNearPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.45, bands: Int = 8, rowsPerBand: Int = 4)
      : DataFrame = {
    val planes = Array.tabulate(bands * rowsPerBand)(hyperplane(_, dim))
    val vecs = df.select(col(idCol).as("doc"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv")).cache()
    val banded = vecs.select(col("doc"),
        graft.functions.HyperplaneBandKeys(col("v"), planes, bands,
          rowsPerBand).as("keys"))
      .select(col("doc"), posexplode(col("keys")).as(Seq("band", "bkey")))
    // dedup bare id pairs BEFORE touching vectors: a pair can collide in
    // several bands, and distinct over float arrays is far costlier than
    // distinct over two longs
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .distinct()
    pairs
      .join(vecs.select(col("doc").as("id_a"), col("v").as("va"),
        col("nv").as("na")), Seq("id_a"))
      .join(vecs.select(col("doc").as("id_b"), col("v").as("vb"),
        col("nv").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineWithNorms(dot(col("va"), col("vb")), col("na"),
          col("nb")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
