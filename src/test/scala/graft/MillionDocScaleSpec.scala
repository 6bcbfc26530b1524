package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 10^6-DOCUMENT probe for the LLM-pipeline operators — the twin of
  * MillionFileScaleSpec for the data plane (a 100 TB text corpus at
  * ~100 KB/doc IS a billion documents; 1M is the largest in-sandbox
  * slice that still proves the SHAPE). Synthetic corpora with planted
  * duplicate clusters drive MinHash-LSH, SimHash and IVF end to end, and
  * the asserts are the scale claims themselves:
  *
  *  - candidate-pair counts stay O(n·bands) — measured by summing
  *    C(bucket,2) over the operator's own blocking keys — never O(n²)
  *    (1M docs all-pairs would be 5·10^11);
  *  - planted near-dup clusters are recovered essentially completely
  *    (the banding miss probability at the planted similarity is ~1e-9);
  *  - wall-clock bounds are generous O(n·polylog) guards against
  *    accidental driver loops or quadratic joins, not benchmark noise.
  *
  * Measured times are recorded in SCALE.md per round. Reference analog:
  * xtable-core/src/test/java/org/apache/xtable/loadtest/LoadTest.java:68-95
  * (the reference load-tests only its metadata plane; it has no data
  * operators to prove).
  */
class MillionDocScaleSpec extends SparkSuite {

  private val n = 1000000L

  /** Corpus of `n` docs: ids < clustered form clusters of `clusterSize`
    * sharing a 24-word base text (words are seed-derived hex tokens, so
    * unrelated docs share ~no shingles); a doc-unique tail token is
    * appended when `variantTail` (near-dups at trigram Jaccard 22/24 ≈
    * 0.92) and omitted otherwise (exact in-cluster duplicates).
    */
  private def corpus(clustered: Long, clusterSize: Int,
      variantTail: Boolean): DataFrame = {
    val base = spark.range(n).select(col("id"),
      when(col("id") < clustered, floor(col("id") / clusterSize))
        .otherwise(col("id") + n).as("seed"))
      .select(col("id"), concat_ws(" ",
        transform(sequence(lit(0), lit(23)),
          i => hex(xxhash64(col("seed"), i)))).as("base"))
    if (variantTail)
      base.select(col("id"),
        concat(col("base"), lit(" "), hex(xxhash64(col("id"), lit(-7))))
          .as("text"))
    else base.select(col("id"), col("base").as("text"))
  }

  private def timed[T](what: String)(f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"$what: $sec%.1f s")
    (r, sec)
  }

  test("1M docs: MinHash-LSH recovers 500k planted near-dup pairs with " +
    "O(n·bands) candidates") {
    // 50k clusters of 5 near-identical variants -> 500k true pairs
    val docs = corpus(clustered = 250000L, clusterSize = 5,
      variantTail = true)
    val truePairs = 50000L * 10L

    // the operator's own blocking: sum of C(bucket, 2) over band buckets
    // IS its candidate-pair count — the O(n·bands) claim, measured
    val grams = graft.operators.Dedup.shingleSets(docs, "id", "text")
    val banded = grams.select(col("doc"),
        graft.functions.SketchFunctions
          .minhash_band_keys(col("shingles"), 64, 16).as("keys"))
      .select(posexplode(col("keys")).as(Seq("band", "bkey")))
    val (cand, candSec) = timed("minhash candidate count") {
      banded.groupBy("band", "bkey").count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
    }
    // intra-cluster pairs collide in ~every band (J^4 ≈ 0.71 each);
    // cross-cluster collisions are hash-rare. 16 bands × 500k true pairs
    // = 8M is the design point; 20M is the regression alarm. O(n²)
    // would be 5·10^11.
    assert(cand <= 20000000L, s"candidate blowup: $cand pairs")
    assert(cand >= truePairs, s"blocking lost the planted clusters: $cand")

    val (pairs, lshSec) = timed("minHashLsh end-to-end") {
      val p = graft.operators.Dedup.minHashLsh(docs, "id", "text",
        threshold = 0.8).localCheckpoint()
      p.count()
      p
    }
    val found = pairs.count()
    // banding miss at J=0.917 is (1-0.917^4)^16 ≈ 3e-9 — effectively
    // every planted pair; threshold 0.8 excludes any cross-cluster pair
    assert(found == truePairs,
      s"expected exactly $truePairs planted pairs, got $found")

    // the cluster keeper over the full 500k-pair graph: min-label
    // propagation must resolve 50k five-doc cliques exactly (every
    // member labeled with its cluster's minimum id) — the O(diameter)
    // shuffle-rounds design, no driver union-find
    val (badLabels, ccSec) = timed("duplicateClusters over 500k pairs") {
      graft.operators.Dedup.duplicateClusters(pairs)
        .filter(col("cluster_rep") =!=
          (col("doc_id") - pmod(col("doc_id"), lit(5L)))).count()
    }
    assert(badLabels == 0L, s"$badLabels docs mislabeled")
    assert(ccSec < 600, s"clustering too slow: $ccSec")
    // the candidate pass runs first (cold JIT, 16M-group aggregation) —
    // measured 243 s vs the LSH's 73 s; the bound guards O(n²), which
    // would be hours
    assert(candSec < 600, s"candidate pass too slow: $candSec")
    assert(lshSec < 900, s"lsh too slow: $lshSec")
  }

  test("1M docs: SimHash recovers planted exact-dup clusters; pigeonhole " +
    "buckets stay ~n·avg-collision, never O(n²)") {
    // 25k clusters of 4 IDENTICAL docs -> 150k true pairs at hamming 0
    val docs = corpus(clustered = 100000L, clusterSize = 4,
      variantTail = false)
    val truePairs = 25000L * 6L

    val grams = graft.operators.Dedup.shingleSets(docs, "id", "text")
    val sigs = grams.select(col("doc"),
      graft.functions.SketchFunctions.simhash64(col("shingles"))
        .as("simhash"))
    val chunks = sigs.select(explode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), 16 * c).bitwiseAND(0xFFFF)
          .cast("long") * 4 + c): _*)).as("ckey"))
    val (cand, candSec) = timed("simhash candidate count") {
      chunks.groupBy("ckey").count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
    }
    // 4 chunks × 2^16 values over ~775k distinct signatures ≈ 12 docs
    // per bucket → ~4·n·(avg-1)/2 ≈ 25M background collisions; the alarm
    // is an order past that, and O(n²) is 5·10^11
    assert(cand <= 250000000L, s"pigeonhole bucket blowup: $cand")

    val (found, shSec) = timed("simHash end-to-end") {
      graft.operators.Dedup.simHash(docs, "id", "text", maxHamming = 1)
        .count()
    }
    // identical docs share the signature (hamming 0, every chunk
    // collides); distinct-seed docs differ in ~32 bits, so hamming ≤ 1
    // false positives are hash-rare — assert a tight band, not equality
    assert(found >= truePairs && found <= truePairs + 100,
      s"expected ~$truePairs planted pairs, got $found")
    assert(candSec < 300, s"candidate pass too slow: $candSec")
    assert(shSec < 900, s"simhash too slow: $shSec")
  }

  test("1M docs at hamming <= 3: auto-blocking widens to 5-chunk pair " +
    "keys and the candidate bound drops below the 4x16 scheme's") {
    val docs = corpus(clustered = 100000L, clusterSize = 4,
      variantTail = false)
    val truePairs = 25000L * 6L

    // the derived scheme: 4x16 single-chunk keys background-collide at
    // ~4n²/2^16 (≈30G potential at 1M docs of distinct signatures — the
    // r11 run measured ~25M because planted dups collapse signatures);
    // pair keys over 5 chunks carry >= 25 effective bits, so background
    // pairs fall to ~C(5,2)·n²/2^25 ≈ 150k
    val scheme = graft.operators.Dedup.simHashBlocking(1000000L, 3)
    assert(scheme == ((5, 2)), s"expected 5-chunk pair keys, got $scheme")

    val grams = graft.operators.Dedup.shingleSets(docs, "id", "text")
    val sigs = grams.select(col("doc"),
      graft.functions.SketchFunctions.simhash64(col("shingles"))
        .as("simhash"))
    // pair-key candidate census: C(5,2)=10 keys/doc, each the
    // concatenation of two 13-bit slices (top slice 12 bits)
    val width = 13
    val mask = (1L << width) - 1L
    def slice(c: Int) =
      shiftrightunsigned(col("simhash"), width * c).bitwiseAND(lit(mask))
    val keys = (0 until 5).combinations(2).toSeq.zipWithIndex.map {
      case (combo, i) =>
        val v = combo.map(slice)
          .reduceLeft((a, b) => shiftleft(a, width).bitwiseOR(b))
        v * 10 + i
    }
    val (cand, candSec) = timed("simhash pair-key candidate count") {
      sigs.select(explode(array(keys: _*)).as("ckey"))
        .groupBy("ckey").count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
    }
    // planted clusters contribute 25k · 10 keys · 6 pairs = 1.5M exact
    // collisions; background adds ~10·n²/2^26 ≈ 150k. Alarm an order
    // past that — and two orders under the 4x16 scheme's 10^7+ band
    assert(cand <= 20000000L, s"pair-key bucket blowup: $cand")

    val (found, shSec) = timed("simHash auto end-to-end") {
      graft.operators.Dedup.simHash(docs, "id", "text", maxHamming = 3,
        docCountHint = 1000000L).count()
    }
    // identical docs sit at hamming 0; distinct-seed docs differ in ~32
    // bits, so hamming <= 3 false positives stay hash-rare
    assert(found >= truePairs && found <= truePairs + 100,
      s"expected ~$truePairs planted pairs, got $found")
    assert(candSec < 300, s"candidate pass too slow: $candSec")
    assert(shSec < 900, s"auto simhash too slow: $shSec")
  }

  test("1M vectors: IVF build + probe serves top-k from probed lists " +
    "only, with brute-force-verified recall") {
    // 100k groups of 10 near-identical vectors, dim 32: each query's
    // true top-5 are groupmates (cos ≈ 1), everything else is a random
    // 32-d direction (|cos| well under 0.5) — a SEPARATED ground truth,
    // so set-recall is meaningful (a flat cluster blob would make top-5
    // a tie-break lottery over thousands of equidistant points)
    val dim = 32
    val vecs = spark.range(n).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        ((pmod(xxhash64(floor(col("id") / 10), d), lit(2000)) - 1000)
          / 1000.0 +
          (pmod(xxhash64(col("id"), d, lit(13)), lit(2000)) - 1000)
            / 33000.0).cast("float")).as("embedding"))
    val queries = vecs.filter(pmod(col("id"), lit(9973)) === 0)

    val (ivf, ivfSec) = timed("ivf build + probe (1M corpus)") {
      val r = graft.operators.Similarity.ivfTopK(vecs, queries, "id",
        "embedding", dim, k = 5, nlist = 64, nprobe = 4).cache()
      r.count()
      r
    }
    val nq = queries.count()
    assert(ivf.count() == nq * 5, "every query must fill its top-5")
    assert(ivfSec < 900, s"ivf too slow: $ivfSec")

    // recall contract vs exact brute force on a query sample: a query's
    // groupmates are near-identical, so they land in the query's own
    // nearest list(s) and a 4-probe IVF must see essentially all of them
    val sample = queries.filter(pmod(col("id"), lit(99730)) === 0)
    val (truth, bfSec) = timed("brute-force ground truth (sample)") {
      graft.operators.Similarity.bruteForceTopK(vecs, sample, "id",
        "embedding", k = 5).select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = ivf.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(got.contains).toDouble / truth.size
    info(f"ivf recall@5 over ${truth.size / 5} sampled queries: $recall%.3f")
    assert(recall >= 0.8, f"ivf recall degraded: $recall%.3f")
    assert(bfSec < 600, s"brute force too slow: $bfSec")
    ivf.unpersist()

    // PQ — the compressed-corpus serving shape (m+4 bytes per vector):
    // codebook fit + ADC scan + exact rerank over the same 1M corpus;
    // recall measured against the same exact ground truth
    val (pq, pqSec) = timed("pq build + topk (1M corpus)") {
      graft.operators.Similarity.pqTopK(vecs, sample, "id", "embedding",
        dim, k = 5, m = 8, ksub = 64).collect()
    }
    val pqGot = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqRecall = truth.count(pqGot.contains).toDouble / truth.size
    info(f"pq recall@5 over ${truth.size / 5} sampled queries: $pqRecall%.3f")
    assert(pqRecall >= 0.8, f"pq recall degraded: $pqRecall%.3f")
    assert(pqSec < 900, s"pq too slow: $pqSec")
  }

  test("1M docs: exact substring dedup recovers 50k planted shared runs " +
    "with O(tokens) gram volume") {
    // 50k doc PAIRS (ids 2i / 2i+1 for i < 100k) share a 12-token run
    // wrapped in per-doc-unique prefix/suffix tokens; the other 900k docs
    // are fully unique. 28 tokens/doc → 21 8-grams/doc → 21M gram rows —
    // the operator's whole working set is O(total tokens), never O(n²)
    // (a suffix-array backend would not distribute at all).
    val planted = 100000L
    val docs = spark.range(n).select(col("id"),
      concat_ws(" ",
        concat_ws(" ", transform(sequence(lit(0), lit(7)),
          i => hex(xxhash64(col("id"), i, lit(1))))),
        when(col("id") < planted,
          concat_ws(" ", transform(sequence(lit(0), lit(11)),
            i => hex(xxhash64(floor(col("id") / 2), i, lit(2))))))
          .otherwise(concat_ws(" ", transform(sequence(lit(0), lit(11)),
            i => hex(xxhash64(col("id"), i, lit(3)))))),
        concat_ws(" ", transform(sequence(lit(0), lit(7)),
          i => hex(xxhash64(col("id"), i, lit(4)))))).as("text"))

    val (profile, sec) = timed("substringDedupSpans over 1M docs") {
      graft.operators.Dedup.substringDedupSpans(docs, "id", "text", n = 8)
        .groupBy("n_spans", "n_dup_grams", "dup_tokens", "total_tokens",
          "kept_tokens")
        .agg(count(lit(1)).as("n_docs")).collect()
    }
    // every planted doc reports EXACTLY one 12-token span (the 5 grams
    // fully inside the shared run, positions 9..13, merged to [9, 20]);
    // no unplanted doc surfaces — an accidental duplicated gram needs 8
    // consecutive 64-bit token collisions
    assert(profile.length == 1, profile.mkString(";"))
    val row = profile.head
    assert(row.getAs[Long]("n_docs") == planted, row.toString)
    assert(row.getAs[Long]("n_spans") == 1L &&
      row.getAs[Long]("n_dup_grams") == 5L &&
      row.getAs[Long]("dup_tokens") == 12L &&
      row.getAs[Long]("total_tokens") == 28L &&
      row.getAs[Long]("kept_tokens") == 16L, row.toString)
    assert(sec < 900, s"substring dedup too slow: $sec")
  }

  test("1M-word vocabulary: BPE trainFast stays two Spark jobs and " +
    "vocabulary-bounded time") {
    // 1M DISTINCT 16-char hex words, one row per word: the
    // word-frequency table IS the corpus here, isolating the training
    // scale axis. The merge loop must run in-process on the collected
    // table (2 Spark jobs regardless of merge count) — at this
    // vocabulary a job-per-merge trainer would pay 40 scheduler
    // round-trips over a 1M-row shuffle each. The hex alphabet makes
    // the WORST case for incrementality: every pair occurs in ~every
    // word, so each merge rescans the bulk of the vocabulary.
    val words = spark.range(n).select(
      lpad(hex(xxhash64(col("id"), lit(1))), 16, "0").as("text"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val (merges, sec) = try {
      timed("bpe trainFast @ 1M vocab") {
        graft.operators.Bpe.trainFast(words, "text", numMerges = 20)
      }
    } finally {
      // drain: one sentinel job, then remove
      spark.range(1).count()
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(merges.size == 20, s"${merges.size} merges")
    // merges stay within the corpus alphabet: lowercased hex (the shared
    // tokenization lowercases) + the end-of-word marker
    assert(merges.forall { case (a, b) =>
      (a + b).replace(graft.operators.Bpe.Eow, "")
        .forall("0123456789abcdef".contains(_)) }, merges.toString)
    // 2 jobs for the word-frequency aggregation + collect, plus the
    // sentinel and at most a couple of planner jobs — NEVER per-merge
    assert(jobs.get() <= 10,
      s"trainFast ran ${jobs.get()} jobs at 1M vocab — expected O(1)")
    assert(sec < 300, s"1M-vocab training too slow: $sec s")
  }
}
