package graft.queries

import graft.Tables
import graft.ext.{CountMin, CountMinAgg, Dedup, MisraGriesAgg, Multimodal, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate queries for the LLM-data-pipeline extensions (BASELINE.json
  * north star): text analysis, the dedup family, similarity search, and
  * multimodal plumbing — all over the `documents` / `embeddings` testdata
  * tables.
  *
  * Oracle strategy: operators built on engine-portable arithmetic (token
  * stats, jaccard, quantized cosine, byte stats) carry exact DuckDB
  * oracles. Operators built on Spark-native hashes (xxhash64 in
  * MinHash/SimHash/LSH buckets) cannot be replicated in DuckDB — their
  * queries emit non-empty deterministic outputs (signatures / candidate
  * counts) and their semantics are pinned by ScalaTest (planted
  * near-duplicates, recall vs brute force).
  */
object ExtQueries {

  /** A child session (shared SparkContext, own conf) with
    * `spark.sql.shuffle.partitions` pinned. The iterative / bucketed
    * gates (x09, x21, x22) schedule many tiny stages; letting AQE pick
    * partition counts at 32-core gate scale makes their bench numbers
    * measure stage-scheduling noise, not code. A DataFrame executes
    * under the conf of the session that BUILT it, so pinning the child
    * session pins every downstream `.count()`/write of the returned
    * plan without touching the caller's session.
    */
  // one child session per (parent, n): sessionState/analyzer init is
  // paid once, so repeated gate invocations (bench warmup + timed run)
  // measure the query, not session construction. Weakly keyed on the
  // parent so a stopped-and-dropped session (test harnesses, notebook
  // servers) is reclaimable rather than pinned for the JVM lifetime —
  // a child session holds no reference back to its parent.
  private val pinnedCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[Int, SparkSession]]()

  private def pinned(s: SparkSession, n: Int = 8): SparkSession =
    pinnedCache.synchronized {
      val perParent = Option(pinnedCache.get(s)).getOrElse {
        val m = scala.collection.mutable.Map.empty[Int, SparkSession]
        pinnedCache.put(s, m)
        m
      }
      perParent.getOrElseUpdate(n, {
        val child = s.newSession()
        child.conf.set("spark.sql.shuffle.partitions", n.toString)
        child
      })
    }

  /** Detach a small eagerly-computed result (connected components keep
    * their label table localCheckpoint'ed for reuse) into a plain
    * LocalRelation and release the checkpoint blocks — gate hygiene: a
    * gate must leave no cached RDDs in a long-lived session. Gate
    * component outputs are bounded (planted clusters + natural
    * near-dups), so the driver round-trip is a few hundred rows.
    */
  private def detach(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    val out = df.sparkSession.createDataFrame(rows, df.schema)
    graft.ext.Dedup.releaseComponents(df)
    out
  }

  /** [[detach]] for plans whose checkpoints sit BELOW the root (e.g. a
    * join over an embedded component-label table): collect once, rebuild
    * as a LocalRelation, release every embedded checkpoint.
    */
  private def detachDeep(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val rows = java.util.Arrays.asList(df.collect(): _*)
    val out = df.sparkSession.createDataFrame(rows, df.schema)
    org.apache.spark.sql.GraftColumnBridge.unpersistEmbeddedCheckpoints(df)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text: token/char counting.
    "x01_token_stats" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          TextAnalysis.tokenCountOver(col("_toks")).as("n_tokens"),
          TextAnalysis.charCount(col("text")).as("n_chars_m"),
          TextAnalysis.avgTokenLenOver(col("_toks"), length(col("text")))
            .as("avg_token_len"))
        .orderBy("doc_id")
    }),

    // ---- text: quality scoring (length/word-shape/stopword ratios).
    "x02_quality_score" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val stops = Seq("a", "the")
      d.select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          TextAnalysis.stopwordRatioOver(col("_toks"), stops).as("stopword_ratio"),
          TextAnalysis.qualityScoreOver(col("_toks"), length(col("text")), stops)
            .as("quality"))
        .orderBy("doc_id")
    }),

    // ---- text: language-ID heuristic, confusion counts vs the labeled
    // lang column.
    "x03_langid" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(col("lang"), TextAnalysis.tokens(col("text")).as("_toks"))
        .select(col("lang"), TextAnalysis.langScoresOver(col("_toks")).as("_scores"))
        .select(col("lang"), TextAnalysis.langIdFromScores(col("_scores")).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),

    // ---- text: document fingerprints (order-insensitive bag hash —
    // oracle-checkable; the order-sensitive rolling hash is spec-pinned).
    "x04_fingerprint" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), TextAnalysis.bagFingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // ---- dedup: exact (hash-groupBy on normalized content).
    "x05_exact_dedup" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Dedup.exact(d, Dedup.normalized(col("text")), col("doc_id"))
        .select(col("canonical_id"), col("copies"))
        .orderBy("canonical_id")
    }),

    // ---- dedup: exact n-gram Jaccard over a bounded pair set.
    "x06_ngram_jaccard" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
      val a = d.alias("a")
      val b = d.alias("b")
      a.join(b, col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          Dedup.ngramJaccard(col("a.text"), col("b.text"), 2).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- dedup: MinHash band signatures through the ENGINE-PORTABLE
    // hash family (md5-derived base hash, affine family mod 2^31-1):
    // DuckDB recomputes every signature value, so the full
    // shingle→minhash→band pipeline is value-checked end to end. The
    // fused xxhash64 kernel path stays the throughput path, pinned by
    // DedupSpec's planted-duplicate recall.
    "x07_minhash_bands" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Dedup.minhashBandsPortable(d, col("doc_id"), col("text"), wordGrams = 3)
        .orderBy("id", "band")
    }),

    // ---- dedup: MinHash LSH planted-duplicate recovery, oracled. An
    // exact copy of each doc_id<25 is planted under id+100000: identical
    // text ⇒ identical shingle set ⇒ identical signature ⇒ same bucket
    // in EVERY band — recovery is guaranteed by MinHash semantics, not
    // hash luck, so DuckDB can state the expected pairs even though it
    // cannot compute xxhash64. The full LSH pipeline (shingle →
    // signature → band → bucket pairs) runs; only the planted pairs are
    // emitted (natural candidates are hash-dependent; spec-pinned).
    "x08_minhash_candidates" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val planted = d.filter(col("doc_id") < 25)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      Dedup.minhashCandidates(d.union(planted), col("doc_id"), col("text"),
          bands = 4, wordGrams = 3)
        .filter(col("id_a") < 25 && col("id_b") === col("id_a") + 100000L)
        .orderBy("id_a")
    }),

    // ---- dedup: SimHash planted-duplicate recovery, oracled. Identical
    // text ⇒ identical 64-bit signature ⇒ Hamming 0 ⇒ every 16-bit band
    // collides — guaranteed recovery with hamming = 0.
    "x09_simhash" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val planted = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      Dedup.simhashCandidates(d.union(planted), col("doc_id"), col("text"))
        .filter(col("id_a") < 50 && col("id_b") === col("id_a") + 100000L)
        .select(col("id_a"), col("id_b"), col("hamming"))
        .orderBy("id_a")
    }),

    // ---- dedup: embedding near-dup planted-duplicate recovery, oracled.
    // An identical vector lands in the same hyperplane bucket by
    // construction and scores cosine ≈ 1 ≥ minCos — guaranteed recovery.
    "x10_embedding_neardup" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings").select("vec_id", "embedding")
      val planted = e.filter(col("vec_id") < 25)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Dedup.embeddingNearDup(e.union(planted), col("vec_id"), col("embedding"),
          minCos = 0.9)
        .filter(col("id_a") < 25 && col("id_b") === col("id_a") + 100000L)
        .select("id_a", "id_b")
        .orderBy("id_a")
    }),

    // ---- similarity: exact brute-force cosine top-3 (quantized arithmetic
    // — bit-identical across engines, fully oracled including the score).
    "x11_ann_bruteforce" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(e, q, k = 3, quantized = true)
        .orderBy("query_id", "rank")
    }),

    // ---- similarity: LSH-bucketed ANN, planted-query rank-1 oracled.
    // Each query is an exact copy of a corpus vector under id+100000: it
    // buckets identically (same hash arithmetic), so the original is
    // always a candidate and wins rank 1 at cosine ≈ 1. Recall of the
    // full top-k vs brute force stays pinned in SimilaritySpec.
    "x12_ann_lsh" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      Similarity.lshTopK(e, q, k = 3)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // ---- as-of join: for each 'error' event, the latest 'purchase' of
    // the same user at or before it (composed as union + one window pass;
    // oracled by DuckDB's native ASOF LEFT JOIN).
    "x15_asof_join" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
      graft.ops.AsofJoin.asof(errors, purchases, Seq("user_id"),
          leftTime = "ts", rightTime = "ts", rightCols = Seq("p_event_id"))
        .select(col("event_id"), col("asof_p_event_id").as("purchase_event_id"))
        .orderBy("event_id")
    }),

    // ---- similarity: IVF (k-means codebook) ANN, planted-query rank-1
    // oracled. A copy of corpus vector i gets i's own centroid (index
    // and probe share ONE bucket-assignment definition,
    // `Ivf.centroidFromScores`), so with nProbe ≥ 1 the probe scans i's
    // bucket and i wins rank 1 at cosine ≈ 1. Full top-k recall stays
    // pinned in IvfSpec.
    "x16_ann_ivf" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val model = graft.ext.Ivf.train(e, "embedding", nCentroids = 16)
      // the full 100 TB shape: index persisted partitioned by centroid,
      // probe statically pruned to its buckets' directories
      val idxPath = java.nio.file.Files
        .createTempDirectory("graft-ivf-gate").resolve("index").toString
      graft.ext.Ivf.writeIndex(graft.ext.Ivf.index(e, model), idxPath)
      val idx = graft.ext.Ivf.readIndex(s, idxPath)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      graft.ext.Ivf.topKPruned(idx, q, model, k = 3, nProbe = 4)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // ---- similarity: product-quantization ANN (256 B/vector → 8 B;
    // ADC table-lookup pruning + exact quantized-cosine rescore).
    // Planted-query rank-1: the copy encodes identically, ADC keeps the
    // original in the candidate set, exact rescore pins it at rank 1.
    "x31_ann_pq" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val model = graft.ext.Pq.train(e, "embedding", m = 8, k = 16)
      val encoded = graft.ext.Pq.encode(e, model)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      graft.ext.Pq.topK(encoded, q, model, k = 3, nCandidates = 64)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // ---- similarity: class centroids (element-wise vector mean per
    // label, quantized arithmetic — every value DuckDB-recomputable).
    "x33_class_centroids" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.classCentroids(e, col("label"), col("embedding"), maxDims = 8)
        .orderBy("label", "pos")
    }),

    // ---- sampling: deterministic content-hash train/test split. The
    // bucket is md5-based so the EXACT membership is recomputable in
    // DuckDB — the oracle checks every row's assignment, not just
    // counts.
    "x17_split_hash" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"),
          Sampling.isTest(col("doc_id"), testPercent = 10).as("is_test"))
        .orderBy("doc_id")
    }),

    // ---- sampling: exact-n stratified sample (n per language);
    // membership is seed-dependent, per-stratum COUNTS are the
    // deterministic contract.
    "x18_stratified_sample" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Sampling.stratifiedSampleExact(d, col("lang"), n = 20)
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    }),

    // ---- sampling: weighted domain mixture — keep all English docs,
    // a deterministic 25% hash fraction of every other language. The
    // bucket is md5-based, so DuckDB recomputes the exact membership.
    "x19_weighted_mixture" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Sampling.weightedMixture(Seq(
          d.filter(col("lang") === "en") -> 1.0,
          d.filter(col("lang") =!= "en") -> 0.25),
          key = col("doc_id"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    // ---- dedup clustering: candidate pairs → connected components.
    // THIRTEEN exact copies of each doc_id<10 are planted at offsets
    // k·100000; keeping only consecutive-copy candidate pairs yields
    // 12-edge CHAINS, so the component min-label must propagate 12 hops
    // — deeper than any fixed-iteration budget the operator ever had
    // (the fixpoint loop converges regardless of diameter) — and every
    // chain's component is provably the base doc_id.
    "x21_dedup_components" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val base = Tables(s, dir, "documents").select("doc_id", "text")
        .filter(col("doc_id") < 10)
      val corpus = (0 until 13).map(k =>
          base.select((col("doc_id") + k * 100000L).as("doc_id"), col("text")))
        .reduce(_ union _)
      val chains = Dedup.minhashCandidates(corpus, col("doc_id"), col("text"),
          bands = 4, wordGrams = 3)
        .filter(col("id_b") === col("id_a") + 100000L)
      detach(Dedup.connectedComponents(chains))
        .orderBy("id")
    }),

    // ---- the end-to-end curation pipeline (quality → langid → dedup →
    // split) as ONE plan, oracled as a whole: the oracle recomposes
    // every stage in SQL, so any drift in any stage OR in their
    // composition order fails the gate.
    "x20_curation_pipeline" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.Curation.curate(d, minQuality = 0.5, testPercent = 10)
        .select(col("doc_id"), col("predicted"), col("is_test"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: binary payload + metadata + batched decode stub.
    "x13_multimodal_features" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 100)
      val media = Multimodal.attachPayload(d, "doc_id", "text", mime = "text/plain")
      Multimodal.decodeFeatures(media).toDF()
        .select(col("media_id"), col("n_bytes"), col("first_byte"), col("byte_sum"))
        .orderBy("media_id")
    }),

    // ---- multimodal: frame sampling plumbing (every 64 bytes → a frame).
    "x14_frame_sample" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 10)
      val media = Multimodal.attachPayload(d, "doc_id", "text")
      Multimodal.sampleFrames(media, stride = 64)
        .orderBy("media_id", "frame_idx")
    }),

    // ---- multimodal: nearest-neighbor resize plumbing (16-sample
    // resample of each payload; checksum of the picked bytes is the
    // cross-engine witness of the index arithmetic).
    "x43_media_resize" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 100)
      val media = Multimodal.attachPayload(d, "doc_id", "text")
      Multimodal.resizeFeatures(media, target = 16).toDF()
        .filter(col("n_bytes") > 0)
        .orderBy("media_id")
    }),

    // ---- benchmark hygiene: train/test contamination by shared word
    // 3-grams over the hash split — set-reduce + one join + one agg,
    // never document-pairwise; DuckDB recomputes the full report.
    "x22_contamination" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      val (train, test) = Sampling.splitByHash(d, col("doc_id"), testPercent = 20)
      graft.ext.Contamination.report(train, test,
          col("doc_id"), col("text"), col("doc_id"), col("text"), n = 3)
        .orderBy("test_id")
    }),

    // ---- quantile cut: per-language p75 length threshold (exact
    // interpolated percentile — partial-aggregable count-map, memory
    // bounded by the value domain, not row count) then filter + profile.
    "x23_percentile_cut" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      // quantize the interpolated p75 to 1/4 (n_chars is integral, so
      // the true quantile is a multiple of 0.25: round(x*4) lands on the
      // same integer in any engine even if evaluation order differs by
      // 1 ULP — raw-double equality across engines is not a contract)
      val thr = d.groupBy("lang")
        .agg((round(expr("percentile(n_chars, 0.75)") * 4) / 4).as("thr"))
      d.join(broadcast(thr), Seq("lang"))
        .filter(col("n_chars").cast("double") >= col("thr"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_keep"), min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
        .join(broadcast(thr), Seq("lang"))
        .select(col("lang"), col("thr"), col("n_keep"),
          col("min_chars"), col("max_chars"))
        .orderBy("lang")
    }),

    // ---- corpus heavy hitters: exact token frequency top-k — partial
    // (map-side) aggregation collapses per-partition counts before the
    // single shuffle, and the top-k is TakeOrderedAndProject, never a
    // global sort.
    "x25_heavy_hitters" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    // ---- BPE-ish token counting: whitespace tokens vs GPT-2-style
    // pre-tokenizer pieces (the subword-cost estimate), same regex in
    // both engines (lookahead-free, Java ≡ RE2).
    "x32_bpe_tokens" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_ws_tokens"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),

    // ---- sequence packing: greedy order-preserving assembly of
    // documents into 512-token training packs (the exact hard-cap
    // chunker applied to token budgets); per-pack profile oracled by
    // the same recursive-CTE greedy walk as op_chunks_greedy.
    "x30_sequence_packing" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        .coalesce(1).sortWithinPartitions("doc_id")
      graft.ingest.Chunker.greedyChunkIds(d, "n_tokens", 512L) match {
        case Right(ch) =>
          val out = ch.df.groupBy(col("_chunk").as("pack_id"))
            .agg(count(lit(1)).as("n_docs"),
              sum("n_tokens").as("pack_tokens"))
            .orderBy("pack_id")
          ch.unpersist()
          out
        case Left(e) => throw new RuntimeException(e.message)
      }
    }),

    // ---- intra-document repetition (Gopher-style quality signals):
    // duplicate 2/3-gram ratios + top-token fraction, pure array
    // expressions over the staged token attribute.
    "x28_repetition" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("_t"))
        .select(col("doc_id"),
          TextAnalysis.dupNgramRatioOver(col("_t"), 2).as("dup_2gram_ratio"),
          TextAnalysis.dupNgramRatioOver(col("_t"), 3).as("dup_3gram_ratio"),
          TextAnalysis.topTokenRatioOver(col("_t")).as("top_token_ratio"))
        .orderBy("doc_id")
    }),

    // ---- PII redaction: deterministic synthetic PII (email / phone /
    // IPv4 derived from doc_id) injected ahead of the corpus text, then
    // scrubbed by the dialect-portable patterns; DuckDB re-runs the
    // same injection and redaction byte-for-byte.
    "x29_pii_redaction" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val withPii = d.select(col("doc_id"),
        concat(lit("contact user"), col("doc_id"),
          lit("@mail"), pmod(col("doc_id"), lit(7)), lit(".com or 555-"),
          lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
          lit("-1234 at 10.0."), pmod(col("doc_id"), lit(256)), lit(".1 "),
          col("text")).as("text"))
      withPii.select(col("doc_id"),
          TextAnalysis.countPattern(col("text"), TextAnalysis.EmailPattern)
            .as("n_emails"),
          TextAnalysis.countPattern(col("text"), TextAnalysis.PhonePattern)
            .as("n_phones"),
          TextAnalysis.redactPii(col("text")).as("redacted"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("redacted")).cast("long").as("redacted_len"),
          substring(col("redacted"), 1, 60).as("redacted_head"))
        .orderBy("doc_id")
    }),

    // ---- sketch-then-verify heavy hitters: the Misra-Gries Aggregator
    // (UDAF surface) finds candidates in one bounded-memory pass; the
    // exact pass counts ONLY candidates. The guarantee (every term with
    // n·k > N survives the sketch) makes the final output exact — equal
    // to the full groupBy the oracle runs — or the gate fails, so the
    // sketch's correctness is itself under test.
    "x27_mg_heavy_hitters" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val toks = Tables(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val sketch = toks.as[String]
        .select(new MisraGriesAgg(50).toColumn).head()
      val candidates = sketch.keys.toSeq.toDF("term")
      val total = toks.count()
      toks.join(broadcast(candidates), Seq("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .filter(col("n") * lit(50L) > lit(total))
        .orderBy("term")
    }),

    // ---- TF-IDF distinguishing terms: per-document top-3 by
    // tf·(N/df) — the exact-ratio idf (log-free, ordering-identical),
    // so DuckDB reproduces every score and rank bit-for-bit.
    "x26_tfidf_terms" -> ((s: SparkSession, dir: String) => {
      TextAnalysis.topDistinguishingTerms(
          Tables(s, dir, "documents"), col("doc_id"), col("text"), k = 3)
        .orderBy("doc_id", "rank")
    }),

    // ---- z-order layout: Morton cells of (partkey, suppkey) — the
    // clustering key under `ZOrder.clusteredWrite`; closed-form bit
    // arithmetic, identical in any engine with shifts and masks.
    "x24_zorder_cells" -> ((s: SparkSession, dir: String) => {
      val li = Tables(s, dir, "lineitem")
      li.select(graft.ops.ZOrder.zValue(
            pmod(col("l_partkey"), lit(1024)).cast("int"),
            pmod(col("l_suppkey"), lit(1024)).cast("int")).as("z"))
        .select(shiftright(col("z"), 14).as("cell"))
        .groupBy("cell")
        .agg(count(lit(1)).as("n"))
        .orderBy("cell")
    }),

    // ---- semantic dedup (SemDeDup): cluster-then-prune with a
    // deterministic seed codebook and exact quantized-cosine arithmetic
    // — planted exact copies (vec_id+100000 of vec_id<25) land in their
    // original's cluster (identical vector ⇒ identical argmax) and flag
    // at cos ≈ 1 ≥ τ; DuckDB recomputes assignment AND pruning exactly.
    "x34_semdedup" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val copies = e.filter(col("vec_id") < 25)
        .withColumn("vec_id", col("vec_id") + 100000L)
      val corpus = e.unionByName(copies)
      val cents = graft.ext.SemDedup.seedCentroids(corpus, k = 8)
      graft.ext.SemDedup.report(corpus, cents, tau = 0.99)
        .orderBy("cluster")
    }),

    // ---- similarity: int8 scalar-quantized brute force — the 4×
    // compressed index (array<tinyint> codes + per-vector scale); exact
    // integer code dot + two IEEE multiplies ⇒ scores oracle exactly.
    "x35_ann_int8" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val idx = Similarity.int8Index(e)
      Similarity.int8TopK(idx, e.filter(col("vec_id") < 5), k = 3)
        .orderBy("query_id", "rank")
    }),

    // ---- BPE merge statistics: corpus-wide adjacent-token-pair
    // frequencies, top 30 — the statistic one BPE/WordPiece training
    // step ranks. Map-side partial agg collapses per-partition pair
    // counts before the single shuffle; top-k is TakeOrderedAndProject.
    "x37_bpe_pair_freqs" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      d.select(TextAnalysis.tokens(col("text")).as("_toks"))
        .select(explode(TextAnalysis.adjacentPairsOver(col("_toks"))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(30)
    }),

    // ---- deterministic epoch shuffle: reproducible global training
    // order from a content hash (md5(seed:id)) — positions assigned by
    // the range-partition + exact-offset composition, never a global
    // window; DuckDB recomputes the same md5 order.
    "x38_epoch_shuffle" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Sampling.epochShuffle(d.select(col("doc_id")), col("doc_id"), seed = 7L)
        .filter(col("pos") < 100)
        .orderBy("pos")
    }),

    // ---- cross-document repeated n-grams (Lee et al. 2022): per-doc
    // fraction of distinct word 3-grams shared with ANY other document —
    // linear gram explode + one count agg + one keyed join, no doc pairs.
    "x36_dup_ngrams" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Dedup.dupNgramCoverage(d, col("doc_id"), col("text"), n = 3)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_shared"),
          col("dup_coverage"))
        .orderBy("doc_id")
    }),

    // ---- distributed k-means: one full Lloyd step (map-side argmax
    // assignment against 8 literal centroids + a k·d-key partial
    // aggregation). Integer-exact sufficient statistics, so DuckDB
    // recomputes the step bit-for-bit.
    "x39_kmeans_step" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val cents = graft.ext.SemDedup.seedCentroids(e, k = 8)
      graft.ext.Clustering.lloydStepStats(e, cents, maxDims = 8)
        .orderBy("cluster", "pos")
    }),

    // ---- exact-n stratified sample with VALUE-level reproducibility:
    // md5-ranked membership per language (x18 oracles only the counts;
    // here the selected doc_ids themselves are engine-portable).
    "x40_stratified_hash_sample" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      Sampling.stratifiedSampleByHash(d, col("lang"), col("doc_id"),
          n = 5, seed = 7L)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    }),

    // ---- incremental corpus update: incoming = the 400+ docs plus 50
    // re-submissions of existing docs under fresh ids; the content
    // fingerprint anti-join must admit only genuinely-new text.
    "x42_incremental_dedup" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val corpus = d.filter(col("doc_id") < 400).select("doc_id", "text")
      val incoming = d.filter(col("doc_id") >= 400).select("doc_id", "text")
        .unionByName(d.filter(col("doc_id") < 50)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      Dedup.newDocuments(corpus, incoming, col("doc_id"), col("text"))
        .select("doc_id").orderBy("doc_id")
    }),

    // ---- BPE merge learning via the BATCHED learner (one driver
    // round-trip per batch of provably-commuting merges — the scale
    // path; differential-tested ≡ sequential in BpeLearnSpec). DuckDB
    // replays the identical sequential fold with list_reduce, so the
    // learned merge table is fully oracled.
    "x41_bpe_learn" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.BpeLearn.learnMergesBatchedDF(d, col("text"), merges = 3)
        .orderBy("rank")
    }),

    // ---- BPE apply: tokenize the corpus with the merge table just
    // learned (learn → apply round trip); per-doc token counts after
    // three merges, replayed end-to-end by the oracle's fold chain.
    "x44_bpe_apply" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val merges = graft.ext.BpeLearn.learnMerges(d, col("text"), merges = 3)
        .map { case (_, pair, _) =>
          val Array(a, b) = pair.split(" ", 2); (a, b)
        }
      graft.ext.BpeLearn.tokenCounts(d, col("doc_id"), col("text"), merges)
        .orderBy("doc_id")
    }),

    // ---- BM25 retrieval: top-25 documents for a bag-of-words query.
    // Per-(doc, term) components are quantized to integer micros BEFORE
    // the per-doc sum, so the total is an order-independent BIGINT both
    // engines agree on exactly (floating sums commute only after
    // quantization). The library's `topK` returns the plain double.
    "x45_bm25" -> ((s: SparkSession, dir: String) => {
      // build-once model path: ONE corpus pass builds (postings, df,
      // n/avgdl) and persists them term-clustered; the query itself
      // touches only the model (per-row components are identical to the
      // direct scoredTerms arithmetic, so the oracle is unchanged)
      val d = Tables(s, dir, "documents")
      val modelDir = java.nio.file.Files
        .createTempDirectory("graft-bm25-model").toString
      graft.ext.Bm25.writeModel(
        graft.ext.Bm25.buildModel(d, col("doc_id"), col("text")), modelDir)
      val model = graft.ext.Bm25.readModel(s, modelDir)
      graft.ext.Bm25.scoredTermsModel(model,
          Seq("vector", "stream", "merge", "dup"))
        .select(col("doc_id"),
          round(col("component") * lit(1000000.0), 0).cast("long")
            .as("_cm"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms"), sum(col("_cm")).as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc_id"))
        .limit(25)
    }),

    // ---- sliding-window chunking: window 16, stride 8 (50% overlap) —
    // model-context splitting as a pure map-side array computation.
    "x46_sliding_chunks" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 40)
      graft.ext.TextAnalysis.slidingChunks(d, col("doc_id"), col("text"),
          window = 16, stride = 8)
        .orderBy("doc_id", "chunk_id")
    }),

    // ---- the full Lee-et-al NearDup pipeline as ONE gate: portable
    // MinHash signatures → LSH bucket candidates → estimated-Jaccard
    // verify ≥ 0.5 → connected components. Two extra copies of each
    // doc_id<10 are planted (three-member clusters whose component is
    // provably the base id); the oracle recomputes EVERY stage — md5
    // signatures, band hashes, bucket pairs, similarity, and the
    // component closure via recursive reachability.
    "x47_neardup_pipeline" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val planted = (1 to 2).map(k => d.filter(col("doc_id") < 10)
          .select((col("doc_id") + k * 100000L).as("doc_id"), col("text")))
        .reduce(_ union _)
      detach(Dedup.nearDupComponentsPortable(d.union(planted),
          col("doc_id"), col("text")))
        .orderBy("id")
    }),

    // ---- Count-Min point-frequency sketch: estimates for the top-20
    // tokens checked against their exact counts (a05/a11's accuracy-
    // oracle device: the sketch's internal hashes are engine-specific,
    // the CONTRACT — exact ≤ est ≤ exact + (e/width)·N — is the oracled
    // output, deterministic on fixed data).
    // NOTE on the gate's strength: the per-term Count-Min bound
    // est ≤ exact + (e/width)·N is PROBABILISTIC — it holds with
    // probability ≥ 1 − e^−depth (≈98.2% per query at depth 4), and the
    // oracle pins cms_ok = TRUE for all 20 probed terms. That is valid
    // for THIS frozen fixture + hash family + (width, depth) — a change
    // to any of them can legitimately produce a (rare) in-contract
    // violation; the contract itself (never undercount; bound holds at
    // the e^−depth rate) is what CountMinSpec tests.
    "x53_count_min" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val width = 1024; val depth = 4
      val toks = Tables(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
      val sketch = toks.as[String]
        .select(new CountMinAgg(width, depth).toColumn).head()
      val total = toks.count()
      val bound = math.ceil(math.E / width * total).toLong
      val top = toks.groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(20)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      top.map { case (t, n) =>
        val est = CountMin.estimate(sketch, width, depth, t)
        (t, n, est >= n && est <= n + bound)
      }.toSeq.toDF("term", "n", "cms_ok").orderBy("term")
    }),

    // ---- exact-substring scrub (Lee et al. span-level dedup): every
    // token covered by a w=8-token window appearing verbatim in >1
    // document is removed; the remainder is rebuilt in order. String
    // gram keys here (engine-auditable); xxhash64 keys are the scale
    // mode, differential-tested in ExactSubstringSpec.
    "x52_exact_substring_scrub" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.ExactSubstring.scrub(d, col("doc_id"), col("text"),
          w = 8, hashGrams = false)
        .orderBy("doc_id")
    }),

    // ---- reciprocal-rank fusion: BM25 relevance (x45's list) fused
    // with a quality prior (x02's score) — hybrid retrieval without
    // score calibration. Both input lists are top-50 via
    // TakeOrderedAndProject; the row_number windows run on those
    // 50-row frames, never the corpus. RRF components quantized to
    // micros before summing (the x45 device).
    "x50_rrf_fusion" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
      val byScore = Window.orderBy(col("score_micros").desc, col("doc_id"))
      val bm = graft.ext.Bm25.scoredTerms(d, col("doc_id"), col("text"),
          Seq("vector", "stream", "merge", "dup"))
        .select(col("doc_id"),
          round(col("component") * lit(1000000.0), 0).cast("long").as("_cm"))
        .groupBy("doc_id").agg(sum(col("_cm")).as("score_micros"))
        .orderBy(col("score_micros").desc, col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(byScore).cast("long"))
      val byQuality = Window.orderBy(col("quality").desc, col("doc_id"))
      val toksCol = graft.ext.TextAnalysis.tokens(col("text"))
      val q = d.select(col("doc_id"), col("text"), toksCol.as("_toks"))
        .select(col("doc_id"),
          graft.ext.TextAnalysis.qualityScoreOver(col("_toks"),
            length(col("text")), Seq("a", "the")).as("quality"))
        .orderBy(col("quality").desc, col("doc_id")).limit(50)
        .withColumn("rank", row_number().over(byQuality).cast("long"))
      graft.ext.Fusion.rrfComponents(
          Seq(bm.select("doc_id", "rank"), q.select("doc_id", "rank")),
          "doc_id", "rank")
        .select(col("doc_id"),
          round(col("component") * lit(1000000.0), 0).cast("long").as("_c"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_lists"), sum(col("_c")).as("rrf_micros"))
        .orderBy(col("rrf_micros").desc, col("doc_id")).limit(20)
    }),

    // ---- token-budget corpus mixing: per-source sampling rates derived
    // from TOKEN budgets (what a token-budgeted training run actually
    // caps), membership by the portable md5 bucket — src0/src1 capped
    // hard, src2's budget exceeds its total (rate-1 branch).
    "x51_token_budget_mix" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val budgets = Map("src0" -> 400L, "src1" -> 800L, "src2" -> 100000L)
      val mix = graft.ext.Sampling.tokenBudgetMix(d, col("source"),
        graft.ext.TextAnalysis.tokenCount(col("text")), col("doc_id"),
        budgets)
      mix.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.ext.TextAnalysis.tokenCount(col("text")))
            .as("n_tokens"))
        .orderBy("source")
    }),

    // ---- unigram-LM log-probability scoring (the perplexity-filter
    // quality signal): per-doc Σ tf·ln p(t) under the corpus-trained
    // add-one-smoothed unigram model; components quantized to micros
    // before the order-independent integer sum (x45's device).
    "x49_unigram_logprob" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val model = graft.ext.UnigramLm.termCounts(d, col("text"))
      graft.ext.UnigramLm.docTermComponents(d, col("doc_id"), col("text"),
          model)
        .select(col("doc_id"), col("tf"),
          round(col("component") * lit(1000000.0), 0).cast("long")
            .as("_cm"))
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_tokens"), sum(col("_cm")).as("lp_micros"))
        .orderBy("doc_id")
    }),

    // ---- per-source token-distribution drift: KL(source ‖ corpus) over
    // the corpus top-40 vocabulary; components quantized to micros
    // before summing (same portability device as x45).
    "x48_source_divergence" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.Divergence.sourceTermComponents(d, col("source"), col("text"),
          vocabSize = 40)
        .select(col("grp"),
          round(col("component") * lit(1000000.0), 0).cast("long")
            .as("_cm"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_terms"), sum(col("_cm")).as("kl_micros"))
        .orderBy("grp")
    }),

    // ---- C4-style segment-level dedup (Raffel et al. 2020 §2.2):
    // keep-first corpus-wide dedup of 10-token segments, reassembling
    // every document from its survivors. The corpus plants both failure
    // modes the operator exists for: a shared 10-token boilerplate
    // header on every third document (survives exactly once) and full
    // copies of the first twenty documents (scrubbed to husks).
    "x54_segment_dedup" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val hdr = "begin legal boilerplate header notice of all rights reserved end"
      val base = d.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, concat_ws(" ", lit(hdr), col("text")))
          .otherwise(col("text")).as("text"))
      val corpus = base.union(
        base.filter(col("doc_id") < 20)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      graft.ext.Dedup.segmentDedup(corpus, col("doc_id"), col("text"),
          segTokens = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- bigram conditional-LM scoring (the order-sensitive perplexity
    // filter): per-doc Σ tf·ln p(nxt|ctx) under the corpus-trained
    // add-one-smoothed bigram model; components quantized to micros
    // before the order-independent integer sum (x49's device).
    "x55_bigram_logprob" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val model = graft.ext.BigramLm.bigramCounts(d, col("text"))
      val v = graft.ext.BigramLm.vocabSize(d, col("text"))
      graft.ext.BigramLm.docBigramComponents(d, col("doc_id"), col("text"),
          model, v)
        .select(col("doc_id"), col("tf"),
          round(col("component") * lit(1000000.0), 0).cast("long")
            .as("_cm"))
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_bigrams"), sum(col("_cm")).as("lp_micros"))
        .orderBy("doc_id")
    }),

    // ---- similarity: composed IVF-PQ ANN — centroid cells bound the
    // corpus fraction a probe scans, byte codes bound the bytes per
    // scanned row; index persisted partitioned by cell, probe statically
    // pruned. Planted-query rank-1: the copy lands in the original's
    // cell with identical codes, ADC keeps it, exact rescore pins it.
    "x56_ann_ivfpq" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val model = graft.ext.IvfPq.train(e, "embedding", nCentroids = 16,
        m = 8, k = 16)
      val idxPath = java.nio.file.Files
        .createTempDirectory("graft-ivfpq-gate").resolve("index").toString
      graft.ext.Ivf.writeIndex(graft.ext.IvfPq.index(e, model), idxPath)
      val idx = graft.ext.Ivf.readIndex(s, idxPath)
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      graft.ext.IvfPq.topKPruned(idx, q, model, k = 3, nProbe = 4,
          nCandidates = 64)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // ---- incremental near-dup corpus update (the production flow of
    // x42's exact twin): a batch of five corpus copies (rejected as
    // corpus near-dups), ten genuinely-new docs (sorted-token texts —
    // no shared word 3-grams with their originals), and five
    // batch-internal twins of the new docs (deduped to the min-id
    // member). Portable signature path end to end, so the oracle
    // replays admission exactly.
    "x57_incremental_neardup" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val sortedText =
        array_join(sort_array(split(col("text"), " ")), " ").as("text")
      val fresh = d.filter(col("doc_id") < 10)
        .select((col("doc_id") + 600000L).as("doc_id"), sortedText)
      val incoming = d.filter(col("doc_id") < 5)
        .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
        .union(fresh)
        .union(fresh.filter(col("doc_id") < 600005L)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      detachDeep(graft.ext.Dedup.newDocumentsNearDup(d, incoming,
          col("doc_id"), col("text")))
        .orderBy("doc_id")
    }),

    // ---- temperature-based source mixing (XLM-R §3.1 α-sampling):
    // α = 0.5 upweights the rarer sources; membership is the portable
    // md5-bucket device, weights integer-quantized before the
    // normalizing sum so the rates replay exactly. (pow(n, 0.5) must
    // agree across engines — both special-case to correctly-rounded
    // sqrt; the 2^-20 round tolerates ulp drift except on exact .5
    // boundaries, a fixture-frozen dependence like x53's.)
    "x58_temperature_mix" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      // keyed on lang — the one skewed grouping in the fixture (en is
      // ~2.7× de), so α = 0.5 visibly reweights
      graft.ext.Sampling.temperatureMixture(d, col("lang"), col("doc_id"),
          alpha = 0.5, targetDocs = 200)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // ---- CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3
    // splits the corpus into head/middle/tail by LM perplexity): docs
    // bucket by corpus quantiles of their per-token unigram logprob.
    // Thresholds use exact-binary p=0.25/0.75 and ×4 quantization
    // (x23's device); the per-token score is an integer milli-logprob,
    // so ordering and comparisons are engine-exact. Thresholds collect
    // driver-side (two doubles) — never a single-row cross join.
    "x61_perplexity_buckets" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val model = graft.ext.UnigramLm.termCounts(d, col("text"))
      graft.ext.UnigramLm
        .perplexityBuckets(d, col("doc_id"), col("text"), model)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("avg_milli")).as("min_milli"),
          max(col("avg_milli")).as("max_milli"))
        .orderBy("bucket")
    }),

    // ---- DSIR importance resampling (Xie et al. 2023): tilt the
    // corpus toward a target domain (lang='de') by the hashed-ngram
    // log-likelihood ratio. Both distribution tables are bounded by the
    // bucket count and broadcast — the corpus never shuffles for
    // scoring; per-feature components quantize to micros before the
    // per-doc sum (engine-exact); selection is a deterministic top-n.
    "x62_dsir_selection" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val target = d.filter(col("lang") === "de")
      val w = graft.ext.Dsir.importanceWeights(d, target,
        col("doc_id"), col("text"))
      detachDeep(graft.ext.Dsir.selectTopN(w, 25))
    }),

    // ---- model-based quality classifier (the GPT-3-style LR filter):
    // two full-batch logistic-regression gradient steps over hashed
    // ngram features (y = lang='en'), then score the corpus. All model
    // state is integer micros — margins are exact long sums, the
    // sigmoid quantizes the moment it leaves double-land — so training
    // is engine-exact and the oracle replays both steps in SQL.
    "x63_quality_classifier" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      val labels = d.select(col("doc_id"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
      val model = graft.ext.QualityClassifier.train(d, col("doc_id"),
        col("text"), labels, steps = 2, lr = 0.05)
      detachDeep(graft.ext.QualityClassifier
        .score(d, col("doc_id"), col("text"), model)
        .orderBy(col("prob_micros").desc, col("doc_id")).limit(25))
    }),

    // ---- Gopher rule-based quality gauntlet (Rae et al. 2021 A1.1):
    // per-doc verdict struct for every rule, all thresholds compared by
    // integer cross-multiplication — one map-side projection, and the
    // oracle replays each rule verbatim. Word bounds + stopword list
    // tuned so the rules discriminate on the synthetic corpus.
    "x64_gopher_rules" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      val cfg = graft.ext.GopherRules.Config(
        minWords = 30L, maxWords = 80L,
        stopwords = Seq("the", "a", "of"), minDistinctStopwords = 2)
      graft.ext.GopherRules.evaluate(d, col("doc_id"), col("text"), cfg)
        .orderBy("doc_id")
    }),

    // ---- pretraining concat-and-chunk packing: documents concatenated
    // in id order and cut into 128-token sequences, docs straddling
    // boundaries — the layout manifest (seq, doc, slice) a dataloader
    // assembles sequences from. Offsets come from the shared-shuffle
    // Positional pass, never a global window; the oracle replays the
    // cumulative-offset arithmetic with a window cumsum.
    "x65_concat_packing" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      graft.ext.ConcatPacking
        .packLayout(d, col("doc_id"), col("text"), seqTokens = 128)
        .orderBy("seq_id", "doc_id")
    }),

    // ---- ROC-AUC of a per-doc score against a binary label
    // (Mann-Whitney rank-sum, exact tie handling via doubled
    // tie-averaged ranks): all-long arithmetic up to ONE final IEEE
    // double division, replayed verbatim by the oracle. Score = token
    // count, label = lang='en' — the calibration check a filtering
    // pipeline runs on its quality scores.
    "x66_auc_eval" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      graft.ext.RankEval.auc(d,
        graft.ext.TextAnalysis.tokenCount(col("text")),
        (col("lang") === "en").cast("int"))
    }),

    // ---- ANN recall@k: the exact top-10 under full 64-dim cosine vs
    // the top-10 under the first 8 dims only (Matryoshka-style
    // dimension truncation) — both deterministic quantized-grid brute
    // force, so the oracle replays BOTH rankings and the recall join.
    // The same evaluator pins IVF/LSH/PQ recall in the spec suite.
    "x67_ann_recall" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val e = Tables(s, dir, "embeddings")
      def trunc(df: DataFrame) = df.select(col("vec_id"),
        slice(col("embedding"), 1, 8).as("embedding"))
      val q = e.filter(col("vec_id") < 20)
      val truth = graft.ext.Similarity
        .bruteForceTopK(e, q, k = 10, quantized = true)
      val cand = graft.ext.Similarity
        .bruteForceTopK(trunc(e), trunc(q), k = 10, quantized = true)
      graft.ext.RankEval.recallAtK(truth, cand, 10).orderBy("query_id")
    }),

    // ---- corpus data card: per-source volumes, exact dup-text rate,
    // and tokenizer fertility (chars per BPE token) — one projection +
    // one grouped agg; ratios via the correctly-rounded IEEE division
    // device, replayed column-for-column by the oracle.
    "x68_corpus_card" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      graft.ext.Profiling.corpusCard(d, col("source"), col("text"))
        .withColumnRenamed("grp", "source")
        .orderBy("source")
    }),

    // ---- canonicalization-keyed exact dedup: planted case, doubled-
    // whitespace, precomposed-accent and combining-mark variants all
    // collapse onto their source doc under the NFD+strip-marks codegen
    // canonical key. DuckDB's strip_accents reproduces the same
    // canonical form, so the whole group structure is oracled.
    "x69_canonical_dedup" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val base = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text")).filter(col("doc_id") < 50)
      val seed = base.filter(col("doc_id") < 5)
      def variant(offset: Long, t: org.apache.spark.sql.Column) =
        seed.select((col("doc_id") + offset).as("doc_id"), t.as("text"))
      val all = base
        .unionByName(variant(200000L, upper(col("text"))))
        .unionByName(variant(300000L,
          regexp_replace(col("text"), " ", "  ")))
        .unionByName(variant(400000L,
          regexp_replace(col("text"), "e", "é")))
        .unionByName(variant(500000L,
          regexp_replace(col("text"), "e", "é")))
      graft.ext.Dedup
        .exact(all, md5(graft.ext.Dedup.canonicalText(col("text"))),
          col("doc_id"))
        .filter(col("copies") > 1)
        .select(col("canonical_id"), col("copies"))
        .orderBy("canonical_id")
    }),

    // ---- PII span audit: typed extraction inventory over a corpus
    // with deterministically planted email/phone/IPv4 spans — the
    // audit-before-redaction surface; patterns are the shared-dialect
    // ones redactPii scrubs, so DuckDB replays extraction verbatim.
    "x70_pii_spans" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      val planted = d.filter(col("doc_id") < 10).select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com"),
          lit(" call 021-555-"),
          lpad(col("doc_id").cast("string"), 4, "0"),
          lit(" from 10.0.0."),
          (col("doc_id") % 256).cast("string")).as("text"))
      val aug = planted.unionByName(
        d.filter(col("doc_id") >= 10).select("doc_id", "text"))
      graft.ext.TextAnalysis.piiSpans(aug, col("doc_id"), col("text"))
        .orderBy("doc_id", "kind", "idx")
    }),

    // ---- winnowing fingerprints (Schleimer et al. 2003): per-doc
    // selected (pos, fp) under the portable md5-polynomial gram hash —
    // the oracle recomputes every window's rightmost minimum
    // set-theoretically (windows × grams join) and must agree with the
    // fused selection kernel position-for-position.
    "x71_winnow_fingerprints" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 40)
      graft.ext.Winnowing.fingerprintTable(d, col("doc_id"), col("text"),
        k = 5, w = 4, portable = true)
        .orderBy("doc_id", "pos")
    }),

    // ---- distributed PCA sufficient statistics: the upper-triangle
    // covariance of the first 8 embedding dims, accumulated on the 2^20
    // integer grid by the flat-buffer CovAgg (exact longs, partition-
    // invariant) — the oracle recomputes every Σqq entry and the same
    // IEEE assembly. Eigen/projection are pinned in Round6bSpec.
    "x72_pca_covariance" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      import s.implicits._
      val e = Tables(s, dir, "embeddings")
      val (n, sums, prods) = graft.ext.Pca.sufficientStats(
        e, slice(col("embedding"), 1, 8), 8)
      def micros(i: Int, j: Int): Long = {
        val off = i * 8 - i * (i - 1) / 2
        val c = (prods(off + (j - i)).toDouble / n
          - (sums(i).toDouble / n) * (sums(j).toDouble / n)) /
          1099511627776.0 * 1000000.0
        BigDecimal(c).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      (for (i <- 0 until 8; j <- i until 8)
        yield (i.toLong, j.toLong, micros(i, j)))
        .toDF("i", "j", "cov_micros").orderBy("i", "j")
    }),

    // ---- hard-negative mining: per single-term query, the BM25 top-20
    // minus the labeled positives (tf >= 3 docs), renumbered in
    // retrieval order (top-20 pool, 10 negatives per query) — the DPR-style negative set, scoring quantized
    // to micros so both engines rank identically.
    "x73_hard_negatives" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      val terms = Seq("vector", "stream", "merge", "dup")
      val st = graft.ext.Bm25
        .scoredTerms(d, col("doc_id"), col("text"), terms)
        .select(col("term").as("query"), col("doc_id"), col("tf"),
          round(col("component") * lit(1000000.0), 0).cast("long").as("cm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query").orderBy(col("cm").desc, col("doc_id"))
      val ranked = st
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 20)
        .select(col("query"), col("doc_id"), col("rank"))
      val positives = st.filter(col("tf") >= 3L)
        .select(col("query"), col("doc_id"))
      graft.ext.Mining.hardNegatives(ranked, positives, k = 20, nNeg = 10)
        .orderBy("query", "neg_rank")
    }),

    // ---- cross-source leakage matrix: planted mirror feeds (every
    // doc < 40 republished under source || '_mirror') must surface as
    // exactly their per-source counts; digests + pair expansion
    // replayed in DuckDB.
    "x74_source_overlap" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents")
      val aug = d.select(col("source"), col("text"))
        .unionByName(d.filter(col("doc_id") < 40)
          .select(concat(col("source"), lit("_mirror")).as("source"),
            col("text")))
      graft.ext.Profiling.sourceOverlap(aug, col("source"), col("text"))
        .orderBy("source_a", "source_b")
    }),

    // ---- cross-source score calibration: per-source quantile ranks
    // over a quality proxy, then ONE global relative cut (top 30% of
    // every source) — the fair-mixing normalization that absolute
    // thresholds get wrong on heterogeneous corpora.
    "x80_quantile_calibration" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.Sampling.quantileNormalize(
          d.select(col("doc_id"), col("source"), col("n_chars")),
          col("source"), col("n_chars"), col("doc_id"))
        .filter(col("qr_micros") >= 700000L)
        .select(col("doc_id"), col("source"), col("qr_micros"))
        .orderBy("source", "doc_id")
    }),

    // ---- LSH calibration curve (the S-curve, measured): prefix
    // variants at 5 overlap levels plant pairs across the Jaccard
    // range, the portable MinHash banding generates candidates, and
    // the gate reports per-level catch counts next to the true 3-gram
    // Jaccard mass — the "measure, don't guess" artifact for the
    // banding parameters (16 hashes × 4 bands ⇒ catch ≈ 1−(1−j⁴)⁴).
    // DuckDB replays signatures, bands, pairs, AND the Jaccard sums.
    "x79_lsh_calibration" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val fs = Seq(2, 4, 6, 8, 10)
      val d = Tables(s, dir, "documents")
        .filter(col("doc_id") < 25)
        .select(col("doc_id"), col("text"),
          graft.ext.TextAnalysis.tokens(col("text")).as("_t"))
        .filter(size(col("_t")) >= 20)
      val variants = fs.map { f =>
        d.select((col("doc_id") + lit(f * 100000L)).as("doc_id"),
          array_join(slice(col("_t"), lit(1),
            floor(size(col("_t")) * lit(f) / lit(10.0)).cast("int")), " ")
            .as("text"))
      }.reduce(_ unionByName _)
      val corpus = d.select(col("doc_id"), col("text")).unionByName(variants)
      val cands = graft.ext.Dedup.minhashCandidatesPortable(
        corpus, col("doc_id"), col("text"))
      val truth = fs.map { f =>
        d.select(col("doc_id").as("id_a"),
          (col("doc_id") + lit(f * 100000L)).as("id_b"), lit(f).as("f"))
      }.reduce(_ unionByName _)
      truth
        .join(d.select(col("doc_id").as("id_a"), col("text").as("_ta")),
          "id_a")
        .join(variants.select(col("doc_id").as("id_b"),
          col("text").as("_tb")), "id_b")
        .join(cands.select(col("id_a"), col("id_b"), lit(1L).as("_hit")),
          Seq("id_a", "id_b"), "left")
        .select(col("f").cast("long").as("f"),
          round(graft.ext.Dedup.ngramJaccard(col("_ta"), col("_tb"), 3)
            * lit(1000000.0), 0).cast("long").as("_jm"),
          coalesce(col("_hit"), lit(0L)).as("_hit"))
        .groupBy("f")
        .agg(count(lit(1)).as("n_pairs"), sum(col("_hit")).as("caught"),
          sum(col("_jm")).as("sum_jaccard_micros"))
        .orderBy("f")
    }),

    // ---- asymmetric n-gram containment next to Jaccard over the same
    // bounded pairs: engulfed documents (subset duplication) score ≈1
    // on containment while Jaccard stays low — both directions emitted.
    // Deliberately pairwise over <20 ids (the x06 shape); at scale the
    // pairs come from the bucketed candidate generators.
    "x77_containment" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"), col("text"))
      val a = d.alias("a")
      val b = d.alias("b")
      a.join(b, col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          graft.ext.Dedup.ngramContainment(col("a.text"), col("b.text"), 2)
            .as("containment"),
          graft.ext.Dedup.ngramJaccard(col("a.text"), col("b.text"), 2)
            .as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- vocabulary coverage / OOV rate against the corpus top-512
    // vocabulary (deterministic freq-then-term order): the pre-
    // tokenizer health check — vocab broadcasts, the corpus shuffles
    // once on doc_id.
    "x78_vocab_coverage" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.TextAnalysis
        .vocabCoverage(d, col("doc_id"), col("text"), 512)
        .orderBy("doc_id")
    }),

    // ---- deterministic weighted sampling (Efraimidis–Spirakis order
    // sampling, integer edition): longer documents weight 1–4 and the
    // top-30 replica-max priorities are the sample — membership and
    // priorities replay bit-exactly in DuckDB (md5 polynomial, no
    // floats anywhere).
    "x75_weighted_sample" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.Sampling.weightedSample(
          d.select(col("doc_id"), col("n_chars")),
          col("doc_id"),
          least(lit(1) + floor(col("n_chars") / lit(400)).cast("int"), lit(4)),
          n = 30)
        .orderBy(col("priority").desc, col("doc_id"))
    }),

    // ---- character-entropy quality signal: per-doc Shannon entropy in
    // micros over the (doc, char) postings shuffle, components
    // quantized before the sum so both engines see identical longs.
    "x76_char_entropy" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      graft.ext.TextAnalysis.charEntropy(d, col("doc_id"), col("text"))
        .orderBy("doc_id")
    }),

    // ---- PageRank over the supplier co-occurrence graph (suppliers
    // linked when they serve the same order): 5 fixed iterations, one
    // edge-key shuffle each, rank state localCheckpoint-ed per pass.
    // Ranks live as INTEGER MICROS and per-edge contributions truncate
    // BEFORE the sum, so the fixpoint math is order-independent and
    // DuckDB replays it bit-exactly with unrolled CTEs.
    "x81_pagerank" -> ((s: SparkSession, dir: String) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val edges = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"))
        .select(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .distinct()
      detachDeep(
        graft.ext.Graph.pageRank(edges, col("src"), col("dst"), iters = 5)
          .select(col("id").as("supp_id"), col("rank").as("rank_micros"))
          .orderBy("supp_id"))
    }),

    // ---- exact per-vertex triangle counts on the ≥3-co-orders
    // supplier graph via compact-forward: edges oriented low→high by
    // (degree, id) before the wedge join, so hub vertices cannot
    // explode the intermediate (O(m^{3/2}) not O(Σd²)). Oracle:
    // brute-force a<b<c three-way self-join.
    "x82_triangles" -> ((s: SparkSession, dir: String) => {
      // gate sizing: a fixed 1-in-4 supplier subset keeps the derived
      // graph's density flat across scale factors (the >=3 co-order
      // threshold alone densifies as orders grow); the kernel is pinned
      // at full strength by GraphSpec
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .filter(pmod(col("l_suppkey"), lit(4)) === 0)
      val sym = li.as("a")
        .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"))
        .groupBy(col("a.l_suppkey").as("src"), col("b.l_suppkey").as("dst"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 3)
        .select(col("src"), col("dst"))
      detachDeep(
        graft.ext.Graph.triangleCount(sym, col("src"), col("dst"))
          .orderBy("id"))
    }),

    // ---- EXACT set-similarity join (Jaccard ≥ 0.90) via rare-first
    // prefix filtering (AllPairs/PPJoin): the recall-1.0 complement to
    // the MinHash path — candidates only from prefix-token collisions
    // plus the length filter, verified with integer cross-
    // multiplication. Oracle brute-forces every pair.
    "x83_setsim_join" -> ((s: SparkSession, dir: String) => {
      // gate sizing: a third of the corpus exercises the same kernel at
      // ~1/9 the pair space; the kernel itself is scale-invariant.
      // The gate runs the GUARDED production entry point
      // (jaccardJoinCapped) with a cap no real bucket can reach — the
      // result is the exact join (capped ≡ exact when nothing drops,
      // Round8Spec/Round8PropSpec) and a non-empty drop report is a
      // LOUD gate error, never a silently smaller answer.
      val d = Tables(s, dir, "documents").filter(col("doc_id") % 3 === 0)
      val out = graft.ext.SetSim.jaccardJoinCapped(d, col("doc_id"),
        col("text"), tauPct = 90, maxPerTok = 1000000)
      val dropped = out.dropped.count()
      if (dropped != 0)
        throw new IllegalStateException(
          s"x83: $dropped prefix buckets over the non-binding cap")
      out.pairs.orderBy("id_a", "id_b")
    }),

    // ---- the DEFAULT similarity-join entry point, oracle-gated: the
    // auto-escalation guard (jaccardJoinAuto behind plain jaccardJoin)
    // must stay byte-identical to the exact join on a real corpus —
    // the measured sf0.1 max prefix bucket is 1262, well under the 4096
    // default, so a non-empty escalation report here is a LOUD gate
    // error, never a silently different answer. A 1/5 corpus slice
    // keeps the pair space distinct from x83's 1/3 slice.
    "x89_setsim_auto" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") % 5 === 0)
      val out = graft.ext.SetSim.jaccardJoinAuto(d, col("doc_id"),
        col("text"), tauPct = 90)
      val escalated = out.escalated.count()
      if (escalated != 0)
        throw new IllegalStateException(
          s"x89: $escalated prefix buckets unexpectedly escalated")
      out.pairs.orderBy("id_a", "id_b")
    }),

    // ---- cluster-representative selection: after near-dup clustering,
    // keep ONE member per component — highest integer-quantized quality,
    // ties to the lowest id. Planted components: doc_id<25 plus four
    // token-prefix variants at k·100000 (k=7..9 keep k/10 of the tokens,
    // k=10 an exact copy); quality is length-driven, so the full-length
    // base usually wins and the k=10 exact copy forces the id tiebreak.
    "x84_component_representatives" -> ((s: SparkSession, dir: String) => {
      val ks = Seq(7, 8, 9, 10)
      val d = Tables(s, dir, "documents")
        .filter(col("doc_id") < 25)
        .select(col("doc_id"), col("text"),
          graft.ext.TextAnalysis.tokens(col("text")).as("_t"))
        .filter(size(col("_t")) >= 20)
      val variants = ks.map { k =>
        d.select((col("doc_id") + lit(k * 100000L)).as("doc_id"),
          array_join(slice(col("_t"), lit(1),
            floor(size(col("_t")) * lit(k) / lit(10.0)).cast("int")), " ")
            .as("text"))
      }.reduce(_ unionByName _)
      val corpus = d.select(col("doc_id"), col("text")).unionByName(variants)
        .withColumn("component", pmod(col("doc_id"), lit(100000L)))
      graft.ext.Dedup.representatives(corpus, col("doc_id"),
          col("component"),
          round(graft.ext.TextAnalysis.qualityScore(col("text"),
            Seq("a", "the")) * lit(1000000.0), 0).cast("long"))
        .orderBy("component")
    }),

    // ---- sorted-neighborhood near-dup join: canonical sorted-token
    // key, global position WITHOUT a single-partition window
    // (Ingest.withPosition), bucketed |i−j| ≤ w self-join, exact
    // Jaccard verify. Exact copies of doc_id<10 planted at +100000 get
    // IDENTICAL keys, hence adjacent positions, hence guaranteed
    // candidacy — so the oracle can assert the full verified pair set.
    "x85_sorted_neighborhood" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").select("doc_id", "text")
        .filter(col("doc_id") < 400)
      val corpus = d.unionByName(
        d.filter(col("doc_id") < 10)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      graft.ext.SetSim.sortedNeighborhoodJoin(corpus, col("doc_id"),
          col("text"), window = 10, tauPct = 80)
        .orderBy("id_a", "id_b")
    }),

    // ---- the ESCALATED similarity-join semantics, oracle-pinned on a
    // fully deterministic synthetic corpus (x89 pins the exact path on
    // real data; this pins what the guard computes when it FIRES). Two
    // 100-doc hot-token families trip escalateAt=64 at tau=50 (two-token
    // docs ⇒ the prefix is the whole doc), a rescue pair's every token
    // is hot (findable only through the neighborhood path), and a cold
    // family contributes kept-prefix pairs incl. a verify-reject. The
    // DuckDB oracle replays the WHOLE algorithm independently — prefix
    // table, bucket widths, hot set, kept pairing, sorted-neighborhood
    // rescue, exact verification — so any drift in the escalation
    // semantics is a hash mismatch, not a spec-only regression.
    "x90_setsim_escalated" -> ((s0: SparkSession, dir: String) => {
      // pinned like the other iterative/bucketed gates (x09/x21/x57):
      // the escalation path schedules ~20 tiny shuffle stages over a
      // 206-doc synthetic corpus — at 32 shuffle partitions the gate
      // measured stage-scheduling, not the algorithm (r19 probe:
      // 780 tasks/rep)
      val s = pinned(s0)
      import s.implicits._
      val fam1 = (0 until 100).map(i => (500000L + i, s"zqhot u$i"))
      val fam2 = (0 until 100).map(i => (600000L + i, s"zqhot2 w$i"))
      val rescue = Seq((700001L, "zqhot zqhot2"), (700002L, "zqhot zqhot2"))
      val cold = Seq((800001L, "p1 p2 p3 p4"), (800002L, "p1 p2 p3 p4"),
        (800003L, "p1 p2 x1 x2"), (800004L, "p1 p2 p3 x9"))
      // 206 rows: one partition, not defaultParallelism slices — every
      // exchange over the local relation otherwise fans out 32 map
      // tasks of ~6 rows each (r19 probe: 780 tasks/rep)
      val docs = (fam1 ++ fam2 ++ rescue ++ cold).toDF("doc_id", "text")
        .coalesce(1)
      val out = graft.ext.SetSim.jaccardJoinAuto(docs, col("doc_id"),
        col("text"), tauPct = 50, escalateAt = 64, neighborhoodWindow = 10)
      val escalated = out.escalated.count()
      if (escalated != 2)
        throw new IllegalStateException(
          s"x90: expected the two hot buckets to escalate, got $escalated")
      out.pairs.orderBy("id_a", "id_b")
    }),

    // ---- calibrated-index CONSUMER contract (r10): build calibrated,
    // persist index + calibration sidecar, then probe via the helper
    // that reads the knobs FROM the sidecar — the full production
    // lifecycle, so a consumer can never silently probe at a default
    // width the calibration rejected. Planted-query rank-1 oracle (the
    // copy's bucket is the original's bucket; any recommended width
    // includes the query's own bucket).
    "x91_ann_ivf_sidecar" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val built = graft.ext.Ivf.buildCalibrated(e, nCentroids = 16, k = 3,
        targetRecall = 0.9, nQueries = 16)
      val idxPath = java.nio.file.Files
        .createTempDirectory("graft-ivfcal-gate").resolve("index").toString
      graft.ext.Ivf.writeIndex(built.indexed, idxPath)
      graft.ext.Ivf.writeCalibration(s, idxPath, built.calibration)
      built.release()
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      graft.ext.Ivf.topKAtRecommended(s, idxPath, q, built.model, k = 3)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id")
        .orderBy("query_id")
    }),

    // ---- the IVF-PQ analog over the compact two-table layout: codes/
    // scanned partition-pruned, vectors/ touched only by the bounded
    // rescore fetch, knobs from the sidecar.
    "x92_ann_ivfpq_sidecar" -> ((s: SparkSession, dir: String) => {
      val e = Tables(s, dir, "embeddings")
      val built = graft.ext.IvfPq.buildCalibrated(e, nCentroids = 16,
        m = 8, k = 3, targetRecall = 0.7, nQueries = 16,
        candidateGrid = Seq(64, 256))
      val idxPath = java.nio.file.Files
        .createTempDirectory("graft-ivfpqcal-gate").resolve("index").toString
      graft.ext.IvfPq.writeIndexCompactFrom(built.indexed, idxPath)
      graft.ext.IvfPq.writeCalibration(s, idxPath, built.calibration)
      built.release()
      val q = e.filter(col("vec_id") < 5)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
      detachDeep(graft.ext.IvfPq
        .topKCompactAtRecommended(s, idxPath, q, built.model, k = 3)
        .filter(col("rank") === 1)
        .select("query_id", "neighbor_id"))
        .orderBy("query_id")
    }),

    // ---- dedup shipped end-to-end: candidates → connected components →
    // ONE representative per cluster (max quality, ties to min id) →
    // survivor list. The composition a curation pipeline actually runs;
    // the oracle re-derives components from the planted chain structure
    // and replays the per-member counts. Five exact copies per base doc
    // (identical text ⇒ identical quality ⇒ the id tiebreak decides);
    // candidate edges restricted to consecutive copies, so components
    // are 4-hop chains and nothing natural interferes.
    "x88_dedup_pipeline_reps" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents").select("doc_id", "text")
        .filter(col("doc_id") < 200)
      val base = d.filter(col("doc_id") < 10)
      val corpus = (1 until 5).map(k =>
          base.select((col("doc_id") + k * 100000L).as("doc_id"), col("text")))
        .foldLeft(d)(_ unionByName _)
      val chains = Dedup.minhashCandidates(corpus, col("doc_id"), col("text"),
          bands = 4, wordGrams = 3)
        .filter(col("id_b") === col("id_a") + 100000L)
      val comps = Dedup.connectedComponents(chains)
      val labeled = corpus
        .join(comps.select(col("id").as("doc_id"), col("component")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"),
          col("text"))
      detachDeep(Dedup.representatives(labeled, col("doc_id"),
          col("component"),
          round(graft.ext.TextAnalysis.qualityScore(col("text"),
            Seq("a", "the")) * lit(1000000.0), 0).cast("long"))
        .select("component", "rep_id", "n_members")
        .orderBy("component"))
    }),

    // ---- cross-corpus near-dup leakage: training docs that are
    // signature-level near-dups of an eval set, via the portable
    // MinHash banding joined ACROSS sides only (no train-internal
    // pairs). Ten train docs are planted verbatim in the eval set at
    // +700000; the estimated-Jaccard verify keeps pairs with >= 8/16
    // matching signature positions, micros-quantized. The oracle
    // replays signatures, bucketing, and the verify bit for bit.
    "x87_crosscorpus_leakage" -> ((s0: SparkSession, dir: String) => {
      val s = pinned(s0)
      val d = Tables(s, dir, "documents").select("doc_id", "text")
      val train = d.filter(col("doc_id") >= 50)
      val evalSet = d.filter(col("doc_id") < 25)
        .unionByName(d.filter(col("doc_id") >= 50 && col("doc_id") < 60)
          .select((col("doc_id") + 700000L).as("doc_id"), col("text")))
      val cands = Dedup.minhashCandidatesBetweenPortable(train, evalSet,
        col("doc_id"), col("text"), col("doc_id"), col("text"))
      val sigT = Dedup.minhashSignaturePortable(train, col("doc_id"), col("text"))
      val sigE = Dedup.minhashSignaturePortable(evalSet, col("doc_id"), col("text"))
      cands
        .join(sigT.select(col("id").as("id_a"), col("sig").as("_sa")), "id_a")
        .join(sigE.select(col("id").as("id_b"), col("sig").as("_sb")), "id_b")
        .select(col("id_a"), col("id_b"),
          round(Dedup.signatureSimilarity(col("_sa"), col("_sb"))
            * lit(1000000.0), 0).cast("long").as("sim_micros"))
        .filter(col("sim_micros") >= 500000L)
        .orderBy("id_a", "id_b")
    }),

    // ---- corpus-order n-gram novelty: distinct 3-grams per doc and how
    // many first appear there (min-id credit) — the marginal-value
    // signal behind data-mixing growth curves. Integer counts; the
    // oracle replays first-seen attribution directly.
    "x86_ngram_novelty" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents").filter(col("doc_id") < 500)
      graft.ext.Novelty.ngramNovelty(d, col("doc_id"), col("text"), n = 3)
        .orderBy("id")
    }),

    // ---- ranking-quality evaluation (nDCG@10 + MRR): retrieval lists
    // ranked by query-term frequency, graded relevance from a paired
    // term — the eval half of the retrieval family, gains quantized to
    // micros (x45's device) and IDCG normalized over the full label
    // table.
    "x60_rank_metrics" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents")
      val pairs = Seq("join" -> "merge", "merge" -> "window",
        "scan" -> "join", "window" -> "scan")
      val toks = d.select(col("doc_id"),
        TextAnalysis.tokens(col("text")).as("_t"))
      def tf(t: String) = size(filter(col("_t"), x => x === t)).cast("long")
      val ranked = pairs.map { case (q, _) =>
        toks.select(lit(q).as("query"), col("doc_id"), tf(q).as("_tf"))
          .filter(col("_tf") > 0)
          .withColumn("rank", row_number().over(Window.partitionBy("query")
            .orderBy(col("_tf").desc, col("doc_id"))).cast("long"))
          .filter(col("rank") <= 10)
          .drop("_tf")
      }.reduce(_ union _)
      val rels = pairs.map { case (q, r) =>
        toks.select(lit(q).as("query"), col("doc_id"),
            least(tf(r), lit(3L)).as("rel"))
          .filter(col("rel") > 0)
      }.reduce(_ union _)
      graft.ext.RankEval.ndcgMrr(ranked, rels, 10).orderBy("query")
    }),

    // ---- bounded-state per-group top-k (typed Aggregator UDAF): the
    // map-side partial keeps ≤ 2k rows per (group, partition), so a hot
    // group never funnels its full contents through one window task.
    "x59_grouped_topk" -> ((s: SparkSession, dir: String) => {
      val d = Tables(s, dir, "documents")
      val topk = udaf(new graft.ext.TopKAgg(5))
      d.groupBy("lang")
        .agg(topk(col("doc_id"), col("n_chars").cast("double")).as("_top"))
        .select(col("lang"), posexplode(col("_top")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
          col("col._2").as("doc_id"),
          col("col._1").cast("long").as("n_chars"))
        .orderBy("lang", "rank")
    }))

  val oracle: Map[String, String] = Map(
    // BM25: the formula is replayed with IDENTICAL operation order and
    // parenthesization as Bm25.scoredTerms, so every double matches
    // bit-for-bit before the micro-quantization.
    "x45_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    avg(CAST(len(tk) AS DOUBLE)) AS avgdl
        |  FROM toks),
        |occ AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
        |  FROM occ WHERE term IN ('vector', 'stream', 'merge', 'dup')
        |  GROUP BY doc_id, term),
        |dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |        GROUP BY term),
        |comp AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      (ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5)) *
        |       ((tf.tf * (1.2 + 1.0)) /
        |        (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / stats.avgdl))))
        |      * 1000000.0, 0) AS BIGINT) AS cm
        |  FROM tf JOIN dfv USING (term), stats)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(cm) AS BIGINT) AS score_micros
        |FROM comp GROUP BY doc_id
        |ORDER BY score_micros DESC, doc_id LIMIT 25""".stripMargin,
    "x46_sliding_chunks" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 40),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, len(toks) - 1, 8)) AS st
        |  FROM t)
        |SELECT doc_id, CAST(st // 8 AS BIGINT) AS chunk_id,
        |  array_to_string(list_slice(toks, st + 1, st + 16), ' ') AS chunk,
        |  CAST(len(list_slice(toks, st + 1, st + 16)) AS BIGINT) AS chunk_len
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,
    "x53_count_min" ->
      """SELECT token AS term, n, TRUE AS cms_ok FROM (
        |  SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  WHERE token <> ''
        |  GROUP BY token ORDER BY n DESC, token LIMIT 20)
        |ORDER BY term""".stripMargin,
    "x52_exact_substring_scrub" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0, len(toks) - 8)) AS st
        |  FROM t),
        |g2 AS (
        |  SELECT doc_id, st,
        |    array_to_string(list_slice(toks, st + 1, st + 8), ' ') AS gram
        |  FROM g),
        |dup AS (SELECT gram FROM g2 GROUP BY gram
        |        HAVING count(DISTINCT doc_id) > 1),
        |fl AS (SELECT g2.doc_id, g2.st FROM g2 JOIN dup USING (gram)),
        |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(st, st + 7))
        |          AS pos
        |        FROM fl),
        |tok AS (SELECT doc_id, unnest(toks) AS tk,
        |          unnest(range(len(toks))) AS pos
        |        FROM t),
        |kept AS (SELECT tok.doc_id, tok.tk, tok.pos FROM tok
        |         ANTI JOIN cov USING (doc_id, pos)),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(tk, ' ' ORDER BY pos) AS new_text
        |        FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |  coalesce(agg.n_kept, 0) AS n_kept,
        |  coalesce(agg.new_text, '') AS new_text
        |FROM t LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "x50_rrf_fusion" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    avg(CAST(len(tk) AS DOUBLE)) AS avgdl
        |  FROM toks),
        |occ AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
        |  FROM occ WHERE term IN ('vector', 'stream', 'merge', 'dup')
        |  GROUP BY doc_id, term),
        |dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |        GROUP BY term),
        |comp AS (
        |  SELECT tf.doc_id,
        |    CAST(round(
        |      (ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5)) *
        |       ((tf.tf * (1.2 + 1.0)) /
        |        (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / stats.avgdl))))
        |      * 1000000.0, 0) AS BIGINT) AS cm
        |  FROM tf JOIN dfv USING (term), stats),
        |bm_scored AS (
        |  SELECT doc_id, CAST(sum(cm) AS BIGINT) AS score_micros
        |  FROM comp GROUP BY doc_id),
        |bm_rank AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY score_micros DESC, doc_id) AS BIGINT) AS rank
        |    FROM bm_scored) WHERE rank <= 50),
        |qual AS (
        |  SELECT doc_id,
        |    least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.5
        |    + least(((CAST(length(text) AS DOUBLE)
        |        - (CAST(len(string_split(text, ' ')) AS DOUBLE) - 1))
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE)) / 8.0,
        |        1.0) * 0.3
        |    + (1.0 - CAST(len(list_filter(string_split(text, ' '),
        |        w -> w IN ('a', 'the'))) AS DOUBLE)
        |        / CAST(len(string_split(text, ' ')) AS DOUBLE)) * 0.2
        |      AS quality
        |  FROM documents),
        |q_rank AS (
        |  SELECT doc_id, rank FROM (
        |    SELECT doc_id, CAST(row_number() OVER (
        |      ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
        |    FROM qual) WHERE rank <= 50),
        |u AS (SELECT doc_id, rank FROM bm_rank
        |      UNION ALL SELECT doc_id, rank FROM q_rank),
        |c AS (SELECT doc_id,
        |        CAST(round((1.0 / (60.0 + rank)) * 1000000.0, 0) AS BIGINT)
        |          AS cm
        |      FROM u)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |  CAST(sum(cm) AS BIGINT) AS rrf_micros
        |FROM c GROUP BY doc_id
        |ORDER BY rrf_micros DESC, doc_id LIMIT 20""".stripMargin,
    "x51_token_budget_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |tot AS (SELECT source, CAST(sum(tok) AS BIGINT) AS total
        |        FROM d GROUP BY source),
        |rates AS (
        |  SELECT source,
        |    CASE source
        |      WHEN 'src0' THEN
        |        greatest(1, CAST(floor(least(1.0, 400.0 / total) * 4096) AS BIGINT))
        |      WHEN 'src1' THEN
        |        greatest(1, CAST(floor(least(1.0, 800.0 / total) * 4096) AS BIGINT))
        |      WHEN 'src2' THEN
        |        greatest(1, CAST(floor(least(1.0, 100000.0 / total) * 4096) AS BIGINT))
        |      ELSE 4096 END AS cap
        |  FROM tot),
        |sel AS (
        |  SELECT d.doc_id, d.source, d.tok
        |  FROM d JOIN rates USING (source)
        |  WHERE (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 29791
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 961
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 31
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 4096
        |     < cap)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens
        |FROM sel GROUP BY source ORDER BY source""".stripMargin,
    "x49_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |occ AS (SELECT doc_id, unnest(tk) AS term FROM toks),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM occ
        |       GROUP BY term),
        |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |         CAST(count(*) AS BIGINT) AS v FROM tc),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM occ GROUP BY doc_id, term),
        |comp AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(
        |      (tf.tf * ln(CAST(tc.cnt + 1 AS DOUBLE) /
        |        (CAST(st.total AS DOUBLE) + CAST(st.v AS DOUBLE))))
        |      * 1000000.0, 0) AS BIGINT) AS cm
        |  FROM tf JOIN tc USING (term), st)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(cm) AS BIGINT) AS lp_micros
        |FROM comp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x47_neardup_pipeline" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id + 200000, text FROM documents WHERE doc_id < 10),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
        |grams AS (
        |  SELECT doc_id, list_transform(range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])) AS g FROM toks),
        |xs AS (
        |  SELECT doc_id, list_transform(g,
        |    t -> CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) % 2147483647) AS x
        |  FROM grams),
        |sig AS (
        |  SELECT doc_id, [
        |    list_min(list_transform(x, v -> (999983 * v + 12345) % 2147483647)),
        |    list_min(list_transform(x, v -> (999979 * v + 67891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999961 * v + 234567) % 2147483647)),
        |    list_min(list_transform(x, v -> (999959 * v + 345679) % 2147483647)),
        |    list_min(list_transform(x, v -> (999953 * v + 456789) % 2147483647)),
        |    list_min(list_transform(x, v -> (999931 * v + 567891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999917 * v + 678901) % 2147483647)),
        |    list_min(list_transform(x, v -> (999907 * v + 789013) % 2147483647)),
        |    list_min(list_transform(x, v -> (999883 * v + 890123) % 2147483647)),
        |    list_min(list_transform(x, v -> (999863 * v + 901237) % 2147483647)),
        |    list_min(list_transform(x, v -> (999841 * v + 123457) % 2147483647)),
        |    list_min(list_transform(x, v -> (999809 * v + 234563) % 2147483647)),
        |    list_min(list_transform(x, v -> (999773 * v + 345677) % 2147483647)),
        |    list_min(list_transform(x, v -> (999749 * v + 456791) % 2147483647)),
        |    list_min(list_transform(x, v -> (999727 * v + 567899) % 2147483647)),
        |    list_min(list_transform(x, v -> (999721 * v + 678911) % 2147483647))
        |  ] AS s FROM xs),
        |bands AS (
        |  SELECT doc_id AS id, CAST(b AS INTEGER) AS band,
        |    ((((((s[b*4+1] * 1000003 + s[b*4+2]) % 2147483648)
        |        * 1000003 + s[b*4+3]) % 2147483648)
        |        * 1000003 + s[b*4+4]) % 2147483648) AS band_hash
        |  FROM sig, range(4) t(b)),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
        |verified AS (
        |  SELECT p.id_a, p.id_b
        |  FROM pairs p
        |  JOIN sig sa ON p.id_a = sa.doc_id
        |  JOIN sig sb ON p.id_b = sb.doc_id
        |  WHERE CAST(len(list_filter(range(16), i -> sa.s[i+1] = sb.s[i+1]))
        |          AS DOUBLE) / 16.0 >= 0.5),
        |nodes AS (
        |  SELECT id_a AS id FROM verified UNION SELECT id_b FROM verified),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM verified
        |  UNION SELECT id_b, id_a FROM verified
        |  UNION SELECT id, id FROM nodes),
        |reach AS (
        |  SELECT src AS a, dst AS b FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src)
        |SELECT a AS id, CAST(min(b) AS BIGINT) AS component
        |FROM reach GROUP BY a ORDER BY id""".stripMargin,
    "x48_source_divergence" ->
      """WITH terms AS (
        |  SELECT source AS grp,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
        |  FROM documents),
        |gt AS (SELECT grp, term, CAST(count(*) AS BIGINT) AS cnt
        |       FROM terms GROUP BY grp, term),
        |corpus AS (SELECT term, CAST(sum(cnt) AS BIGINT) AS corpus_cnt
        |           FROM gt GROUP BY term),
        |vocab AS (SELECT term, corpus_cnt FROM corpus
        |          ORDER BY corpus_cnt DESC, term LIMIT 40),
        |ct AS (SELECT CAST(sum(corpus_cnt) AS BIGINT) AS corpus_total
        |       FROM vocab),
        |gv AS (SELECT gt.grp, gt.term, gt.cnt, vocab.corpus_cnt
        |       FROM gt JOIN vocab USING (term)),
        |tot AS (SELECT grp, CAST(sum(cnt) AS BIGINT) AS grp_total
        |        FROM gv GROUP BY grp),
        |comp AS (
        |  SELECT gv.grp,
        |    CAST(round(
        |      ((CAST(gv.cnt AS DOUBLE) / CAST(tot.grp_total AS DOUBLE)) *
        |       ln((CAST(gv.cnt AS DOUBLE) / CAST(tot.grp_total AS DOUBLE)) /
        |          (CAST(gv.corpus_cnt AS DOUBLE) /
        |           CAST(ct.corpus_total AS DOUBLE))))
        |      * 1000000.0, 0) AS BIGINT) AS cm
        |  FROM gv JOIN tot USING (grp), ct)
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(sum(cm) AS BIGINT) AS kl_micros
        |FROM comp GROUP BY grp ORDER BY grp""".stripMargin,
    "x01_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x02_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('a', 'the'))) AS DOUBLE) AS nstop,
        |    CAST(length(text) AS DOUBLE) AS nchar
        |  FROM documents)
        |SELECT doc_id,
        |  nstop / ntok AS stopword_ratio,
        |  least(nchar / 500.0, 1.0) * 0.5
        |    + least(((nchar - (ntok - 1)) / ntok) / 8.0, 1.0) * 0.3
        |    + (1.0 - nstop / ntok) * 0.2 AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "x03_langid" ->
      """WITH scored AS (
        |  SELECT lang,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','is'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','de','es'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est'))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('的','是','了','在','我'))) AS BIGINT) AS s_zh
        |  FROM documents),
        |pred AS (
        |  SELECT lang, CASE
        |    WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und'
        |    WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
        |    WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
        |    WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
        |    WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
        |    ELSE 'zh' END AS predicted
        |  FROM scored)
        |SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "x04_fingerprint" ->
      """SELECT doc_id,
        |  CAST(sum(ascii(t) * length(t)) % 1000000007 AS BIGINT) AS fp
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x05_exact_dedup" ->
      """SELECT min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS copies
        |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS k
        |      FROM documents)
        |GROUP BY k ORDER BY canonical_id""".stripMargin,
    "x06_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(len(string_split(text,' ')) - 1),
        |    i -> concat(string_split(text,' ')[i+1], ' ', string_split(text,' ')[i+2])
        |  )) AS grams
        |  FROM documents WHERE doc_id < 20)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |  CAST(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    AS jaccard
        |FROM g a, g b WHERE a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "x07_minhash_bands" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, list_transform(range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])) AS g FROM toks),
        |xs AS (
        |  SELECT doc_id, list_transform(g,
        |    t -> CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) % 2147483647) AS x
        |  FROM grams),
        |sig AS (
        |  SELECT doc_id, [
        |    list_min(list_transform(x, v -> (999983 * v + 12345) % 2147483647)),
        |    list_min(list_transform(x, v -> (999979 * v + 67891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999961 * v + 234567) % 2147483647)),
        |    list_min(list_transform(x, v -> (999959 * v + 345679) % 2147483647)),
        |    list_min(list_transform(x, v -> (999953 * v + 456789) % 2147483647)),
        |    list_min(list_transform(x, v -> (999931 * v + 567891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999917 * v + 678901) % 2147483647)),
        |    list_min(list_transform(x, v -> (999907 * v + 789013) % 2147483647)),
        |    list_min(list_transform(x, v -> (999883 * v + 890123) % 2147483647)),
        |    list_min(list_transform(x, v -> (999863 * v + 901237) % 2147483647)),
        |    list_min(list_transform(x, v -> (999841 * v + 123457) % 2147483647)),
        |    list_min(list_transform(x, v -> (999809 * v + 234563) % 2147483647)),
        |    list_min(list_transform(x, v -> (999773 * v + 345677) % 2147483647)),
        |    list_min(list_transform(x, v -> (999749 * v + 456791) % 2147483647)),
        |    list_min(list_transform(x, v -> (999727 * v + 567899) % 2147483647)),
        |    list_min(list_transform(x, v -> (999721 * v + 678911) % 2147483647))
        |  ] AS s FROM xs)
        |SELECT doc_id AS id, CAST(b AS INTEGER) AS band,
        |  ((((((s[b*4+1] * 1000003 + s[b*4+2]) % 2147483648)
        |      * 1000003 + s[b*4+3]) % 2147483648)
        |      * 1000003 + s[b*4+4]) % 2147483648) AS band_hash
        |FROM sig, range(4) t(b)
        |ORDER BY id, band""".stripMargin,
    "x08_minhash_candidates" ->
      """SELECT doc_id AS id_a, doc_id + 100000 AS id_b
        |FROM documents WHERE doc_id < 25 ORDER BY id_a""".stripMargin,
    "x09_simhash" ->
      """SELECT doc_id AS id_a, doc_id + 100000 AS id_b,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents WHERE doc_id < 50 ORDER BY id_a""".stripMargin,
    "x10_embedding_neardup" ->
      """SELECT vec_id AS id_a, vec_id + 100000 AS id_b
        |FROM embeddings WHERE vec_id < 25 ORDER BY id_a""".stripMargin,
    "x12_ann_lsh" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "x16_ann_ivf" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "x31_ann_pq" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "x56_ann_ivfpq" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    // Replays the portable NearDup admission end to end (same signature
    // machinery as the x47 oracle): cross near-dups vs the corpus are
    // rejected, batch-internal components keep their min id.
    "x57_incremental_neardup" ->
      """WITH RECURSIVE fresh AS (
        |  SELECT doc_id + 600000 AS doc_id,
        |    array_to_string(list_sort(string_split(text, ' ')), ' ') AS text
        |  FROM documents WHERE doc_id < 10),
        |incoming AS (
        |  SELECT doc_id + 500000 AS doc_id, text
        |  FROM documents WHERE doc_id < 5
        |  UNION ALL
        |  SELECT doc_id, text FROM fresh
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM fresh WHERE doc_id < 600005),
        |alldocs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, text FROM incoming),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM alldocs),
        |grams AS (
        |  SELECT doc_id, list_transform(range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])) AS g FROM toks),
        |xs AS (
        |  SELECT doc_id, list_transform(g,
        |    t -> CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) % 2147483647) AS x
        |  FROM grams),
        |sig AS (
        |  SELECT doc_id, [
        |    list_min(list_transform(x, v -> (999983 * v + 12345) % 2147483647)),
        |    list_min(list_transform(x, v -> (999979 * v + 67891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999961 * v + 234567) % 2147483647)),
        |    list_min(list_transform(x, v -> (999959 * v + 345679) % 2147483647)),
        |    list_min(list_transform(x, v -> (999953 * v + 456789) % 2147483647)),
        |    list_min(list_transform(x, v -> (999931 * v + 567891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999917 * v + 678901) % 2147483647)),
        |    list_min(list_transform(x, v -> (999907 * v + 789013) % 2147483647)),
        |    list_min(list_transform(x, v -> (999883 * v + 890123) % 2147483647)),
        |    list_min(list_transform(x, v -> (999863 * v + 901237) % 2147483647)),
        |    list_min(list_transform(x, v -> (999841 * v + 123457) % 2147483647)),
        |    list_min(list_transform(x, v -> (999809 * v + 234563) % 2147483647)),
        |    list_min(list_transform(x, v -> (999773 * v + 345677) % 2147483647)),
        |    list_min(list_transform(x, v -> (999749 * v + 456791) % 2147483647)),
        |    list_min(list_transform(x, v -> (999727 * v + 567899) % 2147483647)),
        |    list_min(list_transform(x, v -> (999721 * v + 678911) % 2147483647))
        |  ] AS s FROM xs),
        |bands AS (
        |  SELECT doc_id AS id, CAST(b AS INTEGER) AS band,
        |    ((((((s[b*4+1] * 1000003 + s[b*4+2]) % 2147483648)
        |        * 1000003 + s[b*4+3]) % 2147483648)
        |        * 1000003 + s[b*4+4]) % 2147483648) AS band_hash
        |  FROM sig, range(4) t(b)),
        |crosspairs AS (
        |  SELECT DISTINCT i.id AS iid, c.id AS cid
        |  FROM bands i JOIN bands c
        |    ON i.band = c.band AND i.band_hash = c.band_hash
        |   AND i.id >= 500000 AND c.id < 500000),
        |crossdup AS (
        |  SELECT DISTINCT p.iid AS id
        |  FROM crosspairs p
        |  JOIN sig sa ON p.iid = sa.doc_id
        |  JOIN sig sb ON p.cid = sb.doc_id
        |  WHERE CAST(len(list_filter(range(16), i -> sa.s[i+1] = sb.s[i+1]))
        |          AS DOUBLE) / 16.0 >= 0.5),
        |surv AS (
        |  SELECT doc_id FROM incoming
        |  WHERE doc_id NOT IN (SELECT id FROM crossdup)),
        |spairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
        |  WHERE a.id IN (SELECT doc_id FROM surv)
        |    AND b.id IN (SELECT doc_id FROM surv)),
        |sverified AS (
        |  SELECT p.id_a, p.id_b
        |  FROM spairs p
        |  JOIN sig sa ON p.id_a = sa.doc_id
        |  JOIN sig sb ON p.id_b = sb.doc_id
        |  WHERE CAST(len(list_filter(range(16), i -> sa.s[i+1] = sb.s[i+1]))
        |          AS DOUBLE) / 16.0 >= 0.5),
        |nodes AS (
        |  SELECT id_a AS id FROM sverified UNION SELECT id_b FROM sverified),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM sverified
        |  UNION SELECT id_b, id_a FROM sverified
        |  UNION SELECT id, id FROM nodes),
        |reach AS (
        |  SELECT src AS a, dst AS b FROM edges
        |  UNION
        |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
        |comp AS (
        |  SELECT a AS id, min(b) AS component FROM reach GROUP BY a)
        |SELECT doc_id, text FROM incoming
        |WHERE doc_id IN (SELECT doc_id FROM surv)
        |  AND doc_id NOT IN (SELECT id FROM comp WHERE component <> id)
        |ORDER BY doc_id""".stripMargin,
    "x58_temperature_mix" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
        |cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |        FROM d GROUP BY lang),
        |pw AS (SELECT lang, n,
        |         CAST(round(pow(CAST(n AS DOUBLE), 0.5) * 1048576.0, 0)
        |           AS BIGINT) AS pq
        |       FROM cnt),
        |ps AS (SELECT CAST(sum(pq) AS BIGINT) AS psum FROM pw),
        |rates AS (
        |  SELECT lang,
        |    greatest(1, CAST(floor(least(1.0,
        |      200.0 * (CAST(pq AS DOUBLE) / CAST(psum AS DOUBLE))
        |        / CAST(n AS DOUBLE)) * 4096) AS BIGINT)) AS cap
        |  FROM pw, ps)
        |SELECT d.doc_id, d.lang
        |FROM d JOIN rates USING (lang)
        |WHERE (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 29791
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 961
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 31
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 4096 < cap
        |ORDER BY doc_id""".stripMargin,
    "x61_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |occ AS (SELECT doc_id, unnest(tk) AS term FROM toks),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM occ
        |       GROUP BY term),
        |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |         CAST(count(*) AS BIGINT) AS v FROM tc),
        |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |       FROM occ GROUP BY doc_id, term),
        |comp AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(
        |      (tf.tf * ln(CAST(tc.cnt + 1 AS DOUBLE) /
        |        (CAST(st.total AS DOUBLE) + CAST(st.v AS DOUBLE))))
        |      * 1000000.0, 0) AS BIGINT) AS cm
        |  FROM tf JOIN tc USING (term), st),
        |scored AS (
        |  SELECT doc_id,
        |    CAST(round(CAST(sum(cm) AS DOUBLE) * 1000.0 /
        |      CAST(sum(tf) AS DOUBLE), 0) AS BIGINT) AS avg_milli
        |  FROM comp GROUP BY doc_id),
        |thr AS (
        |  SELECT round(quantile_cont(CAST(avg_milli AS DOUBLE), 0.25) * 4) / 4
        |           AS t_lo,
        |         round(quantile_cont(CAST(avg_milli AS DOUBLE), 0.75) * 4) / 4
        |           AS t_hi
        |  FROM scored),
        |bucketed AS (
        |  SELECT doc_id, avg_milli,
        |    CASE WHEN CAST(avg_milli AS DOUBLE) >= thr.t_hi THEN 'head'
        |         WHEN CAST(avg_milli AS DOUBLE) > thr.t_lo THEN 'middle'
        |         ELSE 'tail' END AS bucket
        |  FROM scored, thr)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(avg_milli) AS min_milli, max(avg_milli) AS max_milli
        |FROM bucketed GROUP BY bucket ORDER BY bucket""".stripMargin,
    "x62_dsir_selection" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, lang, unnest(tk) AS t,
        |    generate_subscripts(tk, 1) AS i
        |  FROM toks),
        |grams AS (
        |  SELECT doc_id, lang, t AS gram FROM pos
        |  UNION ALL
        |  SELECT a.doc_id, a.lang, a.t || ' ' || b.t AS gram
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |feats AS (
        |  SELECT doc_id, lang,
        |    (ascii(substr(md5(gram), 1, 1)) * 29791
        |     + ascii(substr(md5(gram), 2, 1)) * 961
        |     + ascii(substr(md5(gram), 3, 1)) * 31
        |     + ascii(substr(md5(gram), 4, 1))) % 4096 AS feat
        |  FROM grams),
        |df AS (SELECT doc_id, feat, CAST(count(*) AS BIGINT) AS tf,
        |         max(lang) AS lang
        |       FROM feats GROUP BY doc_id, feat),
        |sc AS (SELECT feat, CAST(sum(tf) AS BIGINT) AS s_cnt
        |       FROM df GROUP BY feat),
        |tc AS (SELECT feat, CAST(sum(tf) AS BIGINT) AS t_cnt
        |       FROM df WHERE lang = 'de' GROUP BY feat),
        |st AS (SELECT CAST(sum(s_cnt) AS BIGINT) AS tot FROM sc),
        |tt AS (SELECT CAST(sum(t_cnt) AS BIGINT) AS tot FROM tc),
        |w AS (
        |  SELECT df.doc_id,
        |    CAST(round((CAST(df.tf AS DOUBLE) *
        |      (ln(CAST(coalesce(tc.t_cnt, 0) + 1 AS DOUBLE) /
        |         (CAST(tt.tot AS DOUBLE) + 4096.0))
        |       - ln(CAST(sc.s_cnt + 1 AS DOUBLE) /
        |         (CAST(st.tot AS DOUBLE) + 4096.0))))
        |      * 1000000.0, 0) AS BIGINT) AS wm
        |  FROM df JOIN sc USING (feat) LEFT JOIN tc USING (feat), st, tt)
        |SELECT doc_id, CAST(sum(wm) AS BIGINT) AS weight_micros
        |FROM w GROUP BY doc_id
        |ORDER BY weight_micros DESC, doc_id LIMIT 25""".stripMargin,
    "x63_quality_classifier" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, unnest(tk) AS t, generate_subscripts(tk, 1) AS i
        |  FROM toks),
        |grams AS (
        |  SELECT doc_id, t AS gram FROM pos
        |  UNION ALL
        |  SELECT a.doc_id, a.t || ' ' || b.t AS gram
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |df AS (
        |  SELECT doc_id,
        |    (ascii(substr(md5(gram), 1, 1)) * 29791
        |     + ascii(substr(md5(gram), 2, 1)) * 961
        |     + ascii(substr(md5(gram), 3, 1)) * 31
        |     + ascii(substr(md5(gram), 4, 1))) % 4096 AS feat,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM grams GROUP BY 1, 2),
        |lab AS (SELECT doc_id,
        |          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |        FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
        |e1 AS (
        |  SELECT m.doc_id,
        |    CAST(500000 - l.y * 1000000 AS BIGINT) AS err
        |  FROM (SELECT DISTINCT doc_id FROM df) m JOIN lab l USING (doc_id)),
        |g1 AS (SELECT feat, CAST(sum(df.tf * e1.err) AS BIGINT) AS g
        |       FROM df JOIN e1 USING (doc_id) GROUP BY feat),
        |w1 AS (SELECT feat,
        |         CAST(0 - CAST(round(CAST(g AS DOUBLE)
        |           * (0.05 / CAST(n.n AS DOUBLE)), 0) AS BIGINT) AS BIGINT)
        |           AS w
        |       FROM g1, n),
        |b1 AS (SELECT CAST(0 - CAST(round(CAST(sum(err) AS DOUBLE)
        |         * (0.05 / CAST(n.n AS DOUBLE)), 0) AS BIGINT) AS BIGINT)
        |         AS b
        |       FROM e1, n GROUP BY n.n),
        |m2 AS (
        |  SELECT df.doc_id,
        |    CAST(b1.b + sum(df.tf * coalesce(w1.w, 0)) AS BIGINT) AS mm
        |  FROM df LEFT JOIN w1 USING (feat), b1
        |  GROUP BY df.doc_id, b1.b),
        |e2 AS (
        |  SELECT m2.doc_id,
        |    CAST(CAST(round(1000000.0 /
        |        (1.0 + exp((0.0 - CAST(mm AS DOUBLE)) / 1000000.0)), 0)
        |      AS BIGINT) - l.y * 1000000 AS BIGINT) AS err
        |  FROM m2 JOIN lab l USING (doc_id)),
        |g2 AS (SELECT feat, CAST(sum(df.tf * e2.err) AS BIGINT) AS g
        |       FROM df JOIN e2 USING (doc_id) GROUP BY feat),
        |w2 AS (
        |  SELECT coalesce(g2.feat, w1.feat) AS feat,
        |    CAST(coalesce(w1.w, 0) - CAST(round(CAST(coalesce(g2.g, 0)
        |        AS DOUBLE) * (0.05 / CAST(n.n AS DOUBLE)), 0) AS BIGINT)
        |      AS BIGINT) AS w
        |  FROM g2 FULL JOIN w1 ON g2.feat = w1.feat, n),
        |b2 AS (SELECT CAST(b1.b - CAST(round(CAST(sum(err) AS DOUBLE)
        |         * (0.05 / CAST(n.n AS DOUBLE)), 0) AS BIGINT) AS BIGINT)
        |         AS b
        |       FROM e2, b1, n GROUP BY b1.b, n.n),
        |m3 AS (
        |  SELECT df.doc_id,
        |    CAST(b2.b + sum(df.tf * coalesce(w2.w, 0)) AS BIGINT) AS mm
        |  FROM df LEFT JOIN w2 USING (feat), b2
        |  GROUP BY df.doc_id, b2.b)
        |SELECT doc_id,
        |  CAST(round(1000000.0 /
        |      (1.0 + exp((0.0 - CAST(mm AS DOUBLE)) / 1000000.0)), 0)
        |    AS BIGINT) AS prob_micros
        |FROM m3
        |ORDER BY prob_micros DESC, doc_id LIMIT 25""".stripMargin,
    "x80_quantile_calibration" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN n = 1 THEN 1000000
        |      ELSE round((rn - 1) * 1000000.0 / (n - 1), 0) END AS BIGINT)
        |      AS qr_micros
        |  FROM r)
        |SELECT doc_id, source, qr_micros
        |FROM q WHERE qr_micros >= 700000
        |ORDER BY source, doc_id""".stripMargin,
    "x83_setsim_join" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id % 3 = 0),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |ix AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
        |  FROM ix
        |  JOIN sz sa ON ix.id_a = sa.doc_id
        |  JOIN sz sb ON ix.id_b = sb.doc_id)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(uni AS BIGINT) AS uni
        |FROM j WHERE inter * 100 >= 90 * uni
        |ORDER BY id_a, id_b""".stripMargin,
    "x89_setsim_auto" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE doc_id % 5 = 0),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |ix AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
        |  FROM ix
        |  JOIN sz sa ON ix.id_a = sa.doc_id
        |  JOIN sz sb ON ix.id_b = sb.doc_id)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(uni AS BIGINT) AS uni
        |FROM j WHERE inter * 100 >= 90 * uni
        |ORDER BY id_a, id_b""".stripMargin,
    "x84_component_representatives" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS w
        |  FROM documents
        |  WHERE doc_id < 25
        |    AND len(list_filter(string_split(text, ' '), t -> t <> '')) >= 20),
        |variants AS (
        |  SELECT doc_id + k * 100000 AS doc_id,
        |    array_to_string(w[1:CAST(floor(len(w) * k / 10.0) AS INT)], ' ')
        |      AS text
        |  FROM base, unnest([7, 8, 9, 10]) t(k)),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id, text FROM variants),
        |t AS (
        |  SELECT doc_id, doc_id % 100000 AS component,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x <> '')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('a', 'the'))) AS DOUBLE) AS nstop,
        |    CAST(length(text) AS DOUBLE) AS nchar
        |  FROM corpus),
        |q AS (
        |  SELECT doc_id, component,
        |    CAST(round((least(nchar / 500.0, 1.0) * 0.5
        |      + least(((nchar - (ntok - 1)) / ntok) / 8.0, 1.0) * 0.3
        |      + (1.0 - nstop / ntok) * 0.2) * 1000000.0, 0) AS BIGINT) AS s
        |  FROM t),
        |sel AS (
        |  SELECT component, doc_id, s,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY s DESC, doc_id ASC) AS rn,
        |    count(*) OVER (PARTITION BY component) AS nm
        |  FROM q)
        |SELECT component, doc_id AS rep_id, s AS rep_score,
        |  CAST(nm AS BIGINT) AS n_members
        |FROM sel WHERE rn = 1 ORDER BY component""".stripMargin,
    "x90_setsim_escalated" ->
      """WITH corpus AS (
        |  SELECT 500000 + i AS doc_id, 'zqhot u' || CAST(i AS VARCHAR) AS text
        |  FROM range(100) t(i)
        |  UNION ALL
        |  SELECT 600000 + i, 'zqhot2 w' || CAST(i AS VARCHAR)
        |  FROM range(100) t(i)
        |  UNION ALL SELECT 700001, 'zqhot zqhot2'
        |  UNION ALL SELECT 700002, 'zqhot zqhot2'
        |  UNION ALL SELECT 800001, 'p1 p2 p3 p4'
        |  UNION ALL SELECT 800002, 'p1 p2 p3 p4'
        |  UNION ALL SELECT 800003, 'p1 p2 x1 x2'
        |  UNION ALL SELECT 800004, 'p1 p2 p3 x9'),
        |tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM corpus),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |freq AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
        |pos AS (
        |  SELECT t.doc_id, s.n, t.tok,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY f.df, t.tok)
        |      AS p
        |  FROM tok t JOIN freq f USING (tok) JOIN sz s USING (doc_id)),
        |prefix AS (
        |  SELECT doc_id, n, tok FROM pos
        |  WHERE p <= n - ((50 * n + 99) // 100) + 1),
        |hot AS (
        |  SELECT tok FROM prefix GROUP BY tok HAVING count(*) > 64),
        |kept AS (SELECT * FROM prefix WHERE tok NOT IN (SELECT tok FROM hot)),
        |keptpairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM kept a JOIN kept b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |    AND 100 * a.n >= 50 * b.n AND 100 * b.n >= 50 * a.n),
        |hotdocs AS (
        |  SELECT DISTINCT doc_id FROM prefix
        |  WHERE tok IN (SELECT tok FROM hot)),
        |keyed AS (
        |  SELECT c.doc_id,
        |    array_to_string(list_sort(list_distinct(string_split(c.text,
        |      ' '))), ' ') AS key
        |  FROM corpus c JOIN hotdocs h USING (doc_id)),
        |npos AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS p
        |  FROM keyed),
        |npairs AS (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM npos a JOIN npos b ON b.p > a.p AND b.p <= a.p + 10),
        |cands AS (
        |  SELECT DISTINCT id_a, id_b FROM (
        |    SELECT * FROM keptpairs UNION ALL SELECT * FROM npairs)),
        |ix AS (
        |  SELECT c.id_a, c.id_b, count(*) AS inter
        |  FROM cands c
        |  JOIN tok ta ON ta.doc_id = c.id_a
        |  JOIN tok tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
        |  FROM ix
        |  JOIN sz sa ON ix.id_a = sa.doc_id
        |  JOIN sz sb ON ix.id_b = sb.doc_id)
        |SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
        |  CAST(inter AS BIGINT) AS inter, CAST(uni AS BIGINT) AS uni
        |FROM j WHERE inter * 100 >= 50 * uni
        |ORDER BY id_a, id_b""".stripMargin,
    // Planted-copy rank-1 through the full calibrated persisted
    // lifecycle: identical embedding ⇒ same cell ⇒ any recommended
    // probe width finds the original at cosine 1.
    "x91_ann_ivf_sidecar" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "x92_ann_ivfpq_sidecar" ->
      """SELECT vec_id + 100000 AS query_id, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,
    "x85_sorted_neighborhood" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 10),
        |keyed AS (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_distinct(string_split(text, ' '))),
        |      ' ') AS key
        |  FROM corpus),
        |pos AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY key, doc_id) AS p
        |  FROM keyed),
        |cands AS (
        |  SELECT least(a.doc_id, b.doc_id) AS id_a,
        |    greatest(a.doc_id, b.doc_id) AS id_b
        |  FROM pos a JOIN pos b ON b.p > a.p AND b.p <= a.p + 10),
        |tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM corpus),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |ix AS (
        |  SELECT c.id_a, c.id_b, count(*) AS inter
        |  FROM cands c
        |  JOIN tok ta ON ta.doc_id = c.id_a
        |  JOIN tok tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
        |  FROM ix
        |  JOIN sz sa ON ix.id_a = sa.doc_id
        |  JOIN sz sb ON ix.id_b = sb.doc_id)
        |SELECT id_a, id_b, CAST(inter AS BIGINT) AS inter,
        |  CAST(uni AS BIGINT) AS uni
        |FROM j WHERE inter * 100 >= 80 * uni
        |ORDER BY id_a, id_b""".stripMargin,
    "x88_dedup_pipeline_reps" ->
      """WITH singles AS (
        |  SELECT doc_id AS component, doc_id AS rep_id,
        |    CAST(1 AS BIGINT) AS n_members
        |  FROM documents WHERE doc_id >= 10 AND doc_id < 200),
        |plants AS (
        |  SELECT doc_id AS component, doc_id AS rep_id,
        |    CAST(5 AS BIGINT) AS n_members
        |  FROM documents WHERE doc_id < 10)
        |SELECT component, rep_id, n_members FROM singles
        |UNION ALL SELECT component, rep_id, n_members FROM plants
        |ORDER BY component""".stripMargin,
    "x87_crosscorpus_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 50
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + 700000, text FROM documents
        |  WHERE doc_id >= 50 AND doc_id < 60),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
        |grams AS (
        |  SELECT doc_id, list_transform(range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])) AS g FROM toks),
        |xs AS (
        |  SELECT doc_id, list_transform(g,
        |    t -> CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) % 2147483647) AS x
        |  FROM grams),
        |sig AS (
        |  SELECT doc_id, [
        |    list_min(list_transform(x, v -> (999983 * v + 12345) % 2147483647)),
        |    list_min(list_transform(x, v -> (999979 * v + 67891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999961 * v + 234567) % 2147483647)),
        |    list_min(list_transform(x, v -> (999959 * v + 345679) % 2147483647)),
        |    list_min(list_transform(x, v -> (999953 * v + 456789) % 2147483647)),
        |    list_min(list_transform(x, v -> (999931 * v + 567891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999917 * v + 678901) % 2147483647)),
        |    list_min(list_transform(x, v -> (999907 * v + 789013) % 2147483647)),
        |    list_min(list_transform(x, v -> (999883 * v + 890123) % 2147483647)),
        |    list_min(list_transform(x, v -> (999863 * v + 901237) % 2147483647)),
        |    list_min(list_transform(x, v -> (999841 * v + 123457) % 2147483647)),
        |    list_min(list_transform(x, v -> (999809 * v + 234563) % 2147483647)),
        |    list_min(list_transform(x, v -> (999773 * v + 345677) % 2147483647)),
        |    list_min(list_transform(x, v -> (999749 * v + 456791) % 2147483647)),
        |    list_min(list_transform(x, v -> (999727 * v + 567899) % 2147483647)),
        |    list_min(list_transform(x, v -> (999721 * v + 678911) % 2147483647))
        |  ] AS s FROM xs),
        |bands AS (
        |  SELECT doc_id AS id, CAST(b AS INTEGER) AS band,
        |    ((((((s[b*4+1] * 1000003 + s[b*4+2]) % 2147483648)
        |        * 1000003 + s[b*4+3]) % 2147483648)
        |        * 1000003 + s[b*4+4]) % 2147483648) AS band_hash
        |  FROM sig, range(4) t(b)),
        |cands AS (
        |  SELECT DISTINCT t.id AS id_a, e.id AS id_b
        |  FROM bands t JOIN bands e
        |    ON t.band = e.band AND t.band_hash = e.band_hash
        |   AND t.id >= 50 AND t.id < 700000
        |   AND (e.id < 25 OR e.id >= 700000))
        |SELECT c.id_a, c.id_b,
        |  CAST(round(CAST(len(list_filter(range(16),
        |      i -> sa.s[i+1] = sb.s[i+1])) AS DOUBLE) / 16.0 * 1000000.0, 0)
        |    AS BIGINT) AS sim_micros
        |FROM cands c
        |JOIN sig sa ON c.id_a = sa.doc_id
        |JOIN sig sb ON c.id_b = sb.doc_id
        |WHERE len(list_filter(range(16), i -> sa.s[i+1] = sb.s[i+1])) * 2 >= 16
        |ORDER BY id_a, id_b""".stripMargin,
    "x86_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents WHERE doc_id < 500),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])))) AS gram
        |  FROM d WHERE len(w) >= 3),
        |fs AS (SELECT gram, min(doc_id) AS fid FROM g GROUP BY gram),
        |novel AS (
        |  SELECT fid AS doc_id, count(*) AS novel_grams FROM fs GROUP BY fid),
        |ng AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id)
        |SELECT d.doc_id AS id,
        |  CAST(coalesce(ng.n_grams, 0) AS BIGINT) AS n_grams,
        |  CAST(coalesce(novel.novel_grams, 0) AS BIGINT) AS novel_grams
        |FROM d
        |LEFT JOIN ng ON d.doc_id = ng.doc_id
        |LEFT JOIN novel ON d.doc_id = novel.doc_id
        |ORDER BY id""".stripMargin,
    "x81_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
        |nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |r0 AS (SELECT id, 1000000 // n AS rank FROM nodes CROSS JOIN nn),
        |i1 AS (
        |  SELECT nodes.id,
        |    (15 * 1000000) // (100 * nn.n) +
        |      (85 * coalesce(f.inflow, 0)) // 100 AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.rank // od.outdeg) AS inflow
        |    FROM e JOIN r0 r ON e.src = r.id JOIN od ON e.src = od.src
        |    GROUP BY e.dst) f ON nodes.id = f.id),
        |i2 AS (
        |  SELECT nodes.id,
        |    (15 * 1000000) // (100 * nn.n) +
        |      (85 * coalesce(f.inflow, 0)) // 100 AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.rank // od.outdeg) AS inflow
        |    FROM e JOIN i1 r ON e.src = r.id JOIN od ON e.src = od.src
        |    GROUP BY e.dst) f ON nodes.id = f.id),
        |i3 AS (
        |  SELECT nodes.id,
        |    (15 * 1000000) // (100 * nn.n) +
        |      (85 * coalesce(f.inflow, 0)) // 100 AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.rank // od.outdeg) AS inflow
        |    FROM e JOIN i2 r ON e.src = r.id JOIN od ON e.src = od.src
        |    GROUP BY e.dst) f ON nodes.id = f.id),
        |i4 AS (
        |  SELECT nodes.id,
        |    (15 * 1000000) // (100 * nn.n) +
        |      (85 * coalesce(f.inflow, 0)) // 100 AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.rank // od.outdeg) AS inflow
        |    FROM e JOIN i3 r ON e.src = r.id JOIN od ON e.src = od.src
        |    GROUP BY e.dst) f ON nodes.id = f.id),
        |i5 AS (
        |  SELECT nodes.id,
        |    (15 * 1000000) // (100 * nn.n) +
        |      (85 * coalesce(f.inflow, 0)) // 100 AS rank
        |  FROM nodes CROSS JOIN nn LEFT JOIN (
        |    SELECT e.dst AS id, sum(r.rank // od.outdeg) AS inflow
        |    FROM e JOIN i4 r ON e.src = r.id JOIN od ON e.src = od.src
        |    GROUP BY e.dst) f ON nodes.id = f.id)
        |SELECT id AS supp_id, CAST(rank AS BIGINT) AS rank_micros
        |FROM i5 ORDER BY supp_id""".stripMargin,
    "x82_triangles" ->
      """WITH e AS (
        |  SELECT a.l_suppkey AS src, b.l_suppkey AS dst
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        |  WHERE a.l_suppkey % 4 = 0 AND b.l_suppkey % 4 = 0
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |tri AS (
        |  SELECT x.src AS a, x.dst AS b, y.dst AS c
        |  FROM e x
        |  JOIN e y ON y.src = x.dst AND x.src < x.dst AND x.dst < y.dst
        |  JOIN e z ON z.src = x.src AND z.dst = y.dst),
        |corners AS (
        |  SELECT a AS id FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT id, count(*) AS triangles
        |FROM corners GROUP BY id ORDER BY id""".stripMargin,
    "x79_lsh_calibration" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w
        |  FROM documents
        |  WHERE doc_id < 25 AND len(string_split(text, ' ')) >= 20),
        |variants AS (
        |  SELECT doc_id + f * 100000 AS doc_id,
        |    array_to_string(w[1:CAST(floor(len(w) * f / 10.0) AS INT)], ' ')
        |      AS text
        |  FROM base, unnest([2, 4, 6, 8, 10]) t(f)),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id, text FROM variants),
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
        |grams AS (
        |  SELECT doc_id, list_transform(range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])) AS g FROM toks),
        |xs AS (
        |  SELECT doc_id, list_transform(g,
        |    t -> CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT) % 2147483647) AS x
        |  FROM grams),
        |sig AS (
        |  SELECT doc_id, [
        |    list_min(list_transform(x, v -> (999983 * v + 12345) % 2147483647)),
        |    list_min(list_transform(x, v -> (999979 * v + 67891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999961 * v + 234567) % 2147483647)),
        |    list_min(list_transform(x, v -> (999959 * v + 345679) % 2147483647)),
        |    list_min(list_transform(x, v -> (999953 * v + 456789) % 2147483647)),
        |    list_min(list_transform(x, v -> (999931 * v + 567891) % 2147483647)),
        |    list_min(list_transform(x, v -> (999917 * v + 678901) % 2147483647)),
        |    list_min(list_transform(x, v -> (999907 * v + 789013) % 2147483647)),
        |    list_min(list_transform(x, v -> (999883 * v + 890123) % 2147483647)),
        |    list_min(list_transform(x, v -> (999863 * v + 901237) % 2147483647)),
        |    list_min(list_transform(x, v -> (999841 * v + 123457) % 2147483647)),
        |    list_min(list_transform(x, v -> (999809 * v + 234563) % 2147483647)),
        |    list_min(list_transform(x, v -> (999773 * v + 345677) % 2147483647)),
        |    list_min(list_transform(x, v -> (999749 * v + 456791) % 2147483647)),
        |    list_min(list_transform(x, v -> (999727 * v + 567899) % 2147483647)),
        |    list_min(list_transform(x, v -> (999721 * v + 678911) % 2147483647))
        |  ] AS s FROM xs),
        |bands AS (
        |  SELECT doc_id AS id, CAST(b AS INTEGER) AS band,
        |    ((((((s[b*4+1] * 1000003 + s[b*4+2]) % 2147483648)
        |        * 1000003 + s[b*4+3]) % 2147483648)
        |        * 1000003 + s[b*4+4]) % 2147483648) AS band_hash
        |  FROM sig, range(4) t(b)),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
        |g3 AS (
        |  SELECT doc_id, list_distinct(list_transform(range(len(w) - 2),
        |    i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS g
        |  FROM toks),
        |truth AS (
        |  SELECT b.doc_id AS id_a, b.doc_id + f * 100000 AS id_b, f
        |  FROM base b, unnest([2, 4, 6, 8, 10]) t(f)),
        |eval AS (
        |  SELECT t.f,
        |    CAST(round(CAST(len(list_intersect(ga.g, gb.g)) AS DOUBLE)
        |      / CAST(len(ga.g) + len(gb.g)
        |          - len(list_intersect(ga.g, gb.g)) AS DOUBLE)
        |      * 1000000.0, 0) AS BIGINT) AS jm,
        |    CASE WHEN p.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM truth t
        |  JOIN g3 ga ON t.id_a = ga.doc_id
        |  JOIN g3 gb ON t.id_b = gb.doc_id
        |  LEFT JOIN pairs p ON t.id_a = p.id_a AND t.id_b = p.id_b)
        |SELECT CAST(f AS BIGINT) AS f, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(hit) AS BIGINT) AS caught,
        |  CAST(sum(jm) AS BIGINT) AS sum_jaccard_micros
        |FROM eval GROUP BY f ORDER BY f""".stripMargin,
    "x77_containment" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(len(string_split(text,' ')) - 1),
        |    i -> concat(string_split(text,' ')[i+1], ' ',
        |      string_split(text,' ')[i+2])
        |  )) AS grams
        |  FROM documents WHERE doc_id < 20)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |    CAST(len(a.grams) AS DOUBLE) AS containment,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |    CAST(len(a.grams) + len(b.grams)
        |      - len(list_intersect(a.grams, b.grams)) AS DOUBLE) AS jaccard
        |FROM g a, g b WHERE a.doc_id <> b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "x78_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS term
        |  FROM documents),
        |v AS (
        |  SELECT term FROM (
        |    SELECT term, count(*) AS c FROM toks GROUP BY term
        |    ORDER BY c DESC, term LIMIT 512)),
        |j AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS oov
        |  FROM toks t LEFT JOIN v ON t.term = v.term
        |  GROUP BY t.doc_id)
        |SELECT doc_id, n_tokens,
        |  CAST(round(CAST(oov AS DOUBLE) * 1000000.0
        |    / CAST(n_tokens AS DOUBLE), 0) AS BIGINT) AS oov_micros
        |FROM j ORDER BY doc_id""".stripMargin,
    "x75_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, n_chars,
        |    least(CAST(1 + floor(n_chars / 400.0) AS INT), 4) AS w
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars,
        |    list_max(list_transform(generate_series(1, w), r ->
        |      CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 1, 1)) AS BIGINT) * 27512614111
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 2, 1)) AS BIGINT) * 887503681
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 3, 1)) AS BIGINT) * 28629151
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 4, 1)) AS BIGINT) * 923521
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 5, 1)) AS BIGINT) * 29791
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 6, 1)) AS BIGINT) * 961
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 7, 1)) AS BIGINT) * 31
        |      + CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR) || '#'
        |          || CAST(r AS VARCHAR)), 8, 1)) AS BIGINT))) AS priority
        |  FROM w)
        |SELECT doc_id, n_chars, CAST(priority AS BIGINT) AS priority
        |FROM p ORDER BY priority DESC, doc_id LIMIT 30""".stripMargin,
    "x76_char_entropy" ->
      """WITH cs AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE strlen(text) > 0),
        |k AS (
        |  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS k
        |  FROM cs GROUP BY doc_id, ch),
        |d AS (
        |  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(k * ln(k) * 1000000.0, 0) AS BIGINT))
        |      AS BIGINT) AS s_micros
        |  FROM k GROUP BY doc_id)
        |SELECT doc_id, n,
        |  CAST(CAST(round(ln(n) * 1000000.0, 0) AS BIGINT)
        |    - CAST(round(CAST(s_micros AS DOUBLE) / CAST(n AS DOUBLE), 0)
        |        AS BIGINT) AS BIGINT) AS entropy_micros
        |FROM d ORDER BY doc_id""".stripMargin,
    "x74_source_overlap" ->
      """WITH aug AS (
        |  SELECT source, text FROM documents
        |  UNION ALL
        |  SELECT source || '_mirror', text FROM documents
        |  WHERE doc_id < 40),
        |p AS (SELECT DISTINCT md5(text) AS h, source FROM aug),
        |g AS (
        |  SELECT h, list_sort(list(source)) AS srcs
        |  FROM p GROUP BY h HAVING len(list(source)) >= 2),
        |pr AS (
        |  SELECT g.h, g.srcs[i.i] AS source_a, g.srcs[j.j] AS source_b
        |  FROM g,
        |    unnest(generate_series(1, len(g.srcs))) i(i),
        |    unnest(generate_series(1, len(g.srcs))) j(j)
        |  WHERE j.j > i.i)
        |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS shared_texts
        |FROM pr GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "x73_hard_negatives" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |    avg(CAST(len(tk) AS DOUBLE)) AS avgdl
        |  FROM toks),
        |occ AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, unnest(tk) AS term
        |  FROM toks),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, min(dl) AS dl
        |  FROM occ WHERE term IN ('vector', 'stream', 'merge', 'dup')
        |  GROUP BY doc_id, term),
        |dfv AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |        GROUP BY term),
        |comp AS (
        |  SELECT tf.term AS query, tf.doc_id, tf.tf,
        |    CAST(round(
        |      (ln(1.0 + (stats.n - dfv.df + 0.5) / (dfv.df + 0.5)) *
        |       ((tf.tf * (1.2 + 1.0)) /
        |        (tf.tf + 1.2 * (0.25 + (0.75 * tf.dl) / stats.avgdl))))
        |      * 1000000.0, 0) AS BIGINT) AS cm
        |  FROM tf JOIN dfv USING (term), stats),
        |ranked AS (
        |  SELECT query, doc_id,
        |    CAST(row_number() OVER (PARTITION BY query
        |      ORDER BY cm DESC, doc_id) AS BIGINT) AS rank
        |  FROM comp),
        |topk AS (SELECT * FROM ranked WHERE rank <= 20),
        |pos AS (SELECT query, doc_id FROM comp WHERE tf >= 3),
        |neg AS (
        |  SELECT t.query, t.doc_id, t.rank
        |  FROM topk t LEFT JOIN pos p
        |    ON t.query = p.query AND t.doc_id = p.doc_id
        |  WHERE p.doc_id IS NULL),
        |renum AS (
        |  SELECT query, doc_id, rank,
        |    CAST(row_number() OVER (PARTITION BY query ORDER BY rank)
        |      AS BIGINT) AS neg_rank
        |  FROM neg)
        |SELECT query, neg_rank, doc_id, rank
        |FROM renum WHERE neg_rank <= 10
        |ORDER BY query, neg_rank""".stripMargin,
    "x72_pca_covariance" ->
      """WITH q AS (
        |  SELECT list_transform(embedding[1:8],
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
        |    AS v
        |  FROM embeddings),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM q),
        |pairs AS (
        |  SELECT i.i AS i, j.j AS j
        |  FROM unnest(generate_series(1, 8)) i(i),
        |       unnest(generate_series(1, 8)) j(j)
        |  WHERE j.j >= i.i),
        |s AS (
        |  SELECT p.i, p.j,
        |    CAST(sum(v[p.i] * v[p.j]) AS BIGINT) AS pij,
        |    CAST(sum(v[p.i]) AS BIGINT) AS si,
        |    CAST(sum(v[p.j]) AS BIGINT) AS sj
        |  FROM q, pairs p GROUP BY p.i, p.j)
        |SELECT CAST(s.i - 1 AS BIGINT) AS i, CAST(s.j - 1 AS BIGINT) AS j,
        |  CAST(round((CAST(pij AS DOUBLE) / n.n
        |    - (CAST(si AS DOUBLE) / n.n) * (CAST(sj AS DOUBLE) / n.n))
        |    / 1099511627776.0 * 1000000.0, 0) AS BIGINT) AS cov_micros
        |FROM s, n ORDER BY i, j""".stripMargin,
    "x71_winnow_fingerprints" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id < 40 AND strlen(text) >= 5),
        |g AS (
        |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS pos,
        |    CAST(ascii(substr(md5(substr(text, j, 5)), 1, 1)) * 29791
        |     + ascii(substr(md5(substr(text, j, 5)), 2, 1)) * 961
        |     + ascii(substr(md5(substr(text, j, 5)), 3, 1)) * 31
        |     + ascii(substr(md5(substr(text, j, 5)), 4, 1)) AS BIGINT)
        |      AS h
        |  FROM d, unnest(generate_series(1, strlen(text) - 4)) t(j)),
        |n AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
        |  FROM g GROUP BY doc_id),
        |wins0 AS (
        |  SELECT n.doc_id, CAST(wi.i AS BIGINT) AS wi
        |  FROM n, unnest(generate_series(0, greatest(n.n - 4, 0))) wi(i)),
        |wins AS (
        |  SELECT w.doc_id, w.wi, min(g.h) AS mh
        |  FROM wins0 w JOIN g ON g.doc_id = w.doc_id
        |    AND g.pos >= w.wi AND g.pos < w.wi + 4
        |  GROUP BY w.doc_id, w.wi),
        |sel AS (
        |  SELECT w.doc_id, w.wi, max(g.pos) AS pos, w.mh
        |  FROM wins w JOIN g ON g.doc_id = w.doc_id AND g.h = w.mh
        |    AND g.pos >= w.wi AND g.pos < w.wi + 4
        |  GROUP BY w.doc_id, w.wi, w.mh)
        |SELECT DISTINCT doc_id, pos, mh AS fp
        |FROM sel ORDER BY doc_id, pos""".stripMargin,
    "x70_pii_spans" ->
      """WITH aug AS (
        |  SELECT doc_id, text || ' contact user'
        |    || CAST(doc_id AS VARCHAR) || '@example.com'
        |    || ' call 021-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
        |    || ' from 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS t
        |  FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 10),
        |e AS (
        |  SELECT doc_id, 'email' AS kind,
        |    generate_subscripts(m, 1) AS idx, unnest(m) AS span
        |  FROM (SELECT doc_id, regexp_extract_all(t,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}') AS m
        |    FROM aug)
        |  UNION ALL
        |  SELECT doc_id, 'phone', generate_subscripts(m, 1), unnest(m)
        |  FROM (SELECT doc_id, regexp_extract_all(t,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}') AS m FROM aug)
        |  UNION ALL
        |  SELECT doc_id, 'ipv4', generate_subscripts(m, 1), unnest(m)
        |  FROM (SELECT doc_id, regexp_extract_all(t,
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}') AS m
        |    FROM aug))
        |SELECT doc_id, kind, CAST(idx AS BIGINT) AS idx, span
        |FROM e ORDER BY doc_id, kind, idx""".stripMargin,
    "x69_canonical_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 50),
        |seed AS (SELECT doc_id, text FROM base WHERE doc_id < 5),
        |v AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 200000, upper(text) FROM seed
        |  UNION ALL
        |  SELECT doc_id + 300000, replace(text, ' ', '  ') FROM seed
        |  UNION ALL
        |  SELECT doc_id + 400000, replace(text, 'e', chr(233)) FROM seed
        |  UNION ALL
        |  SELECT doc_id + 500000, replace(text, 'e', 'e' || chr(769))
        |  FROM seed),
        |c AS (
        |  SELECT doc_id, md5(lower(trim(regexp_replace(
        |    strip_accents(text), '[ \t\n\x0B\f\r]+', ' ', 'g')))) AS k
        |  FROM v)
        |SELECT CAST(min(doc_id) AS BIGINT) AS canonical_id,
        |  CAST(count(*) AS BIGINT) AS copies
        |FROM c GROUP BY k HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,
    "x68_corpus_card" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(string_split(trim(
        |      regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' '))
        |      AS BIGINT) AS n_toks,
        |    CAST(len(regexp_extract_all(text,
        |      '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+'))
        |      AS BIGINT) AS n_bpe,
        |    CAST(strlen(text) AS BIGINT) AS n_chars,
        |    md5(text) AS digest
        |  FROM documents),
        |g AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |    CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
        |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |    CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct_texts
        |  FROM t GROUP BY source)
        |SELECT source, n_docs, n_tokens, n_bpe_tokens, n_chars,
        |  n_distinct_texts,
        |  CAST(round(CAST(n_docs - n_distinct_texts AS DOUBLE) * 1000000.0
        |    / CAST(n_docs AS DOUBLE), 0) AS BIGINT) AS dup_rate_micros,
        |  CAST(round(CAST(n_tokens AS DOUBLE) * 1000000.0
        |    / CAST(n_docs AS DOUBLE), 0) AS BIGINT)
        |    AS avg_doc_tokens_micros,
        |  CAST(round(CAST(n_chars AS DOUBLE) * 1000000.0
        |    / CAST(n_bpe_tokens AS DOUBLE), 0) AS BIGINT)
        |    AS fertility_micros
        |FROM g ORDER BY source""".stripMargin,
    "x67_ann_recall" ->
      """WITH fq AS (
        |  SELECT vec_id AS query_id, list_transform(embedding,
        |    x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS v
        |  FROM embeddings WHERE vec_id < 20),
        |fc AS (
        |  SELECT vec_id AS neighbor_id, list_transform(embedding,
        |    x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS v
        |  FROM embeddings),
        |ft AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT fq.query_id, fc.neighbor_id,
        |      row_number() OVER (PARTITION BY fq.query_id ORDER BY
        |        list_inner_product(fq.v, fc.v) /
        |          (sqrt(list_inner_product(fq.v, fq.v))
        |           * sqrt(list_inner_product(fc.v, fc.v))) DESC,
        |        fc.neighbor_id) AS rk
        |    FROM fq, fc WHERE fq.query_id <> fc.neighbor_id)
        |  WHERE rk <= 10),
        |tq AS (
        |  SELECT vec_id AS query_id, list_transform(embedding[1:8],
        |    x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS v
        |  FROM embeddings WHERE vec_id < 20),
        |tc AS (
        |  SELECT vec_id AS neighbor_id, list_transform(embedding[1:8],
        |    x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS v
        |  FROM embeddings),
        |tt AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT tq.query_id, tc.neighbor_id,
        |      row_number() OVER (PARTITION BY tq.query_id ORDER BY
        |        list_inner_product(tq.v, tc.v) /
        |          (sqrt(list_inner_product(tq.v, tq.v))
        |           * sqrt(list_inner_product(tc.v, tc.v))) DESC,
        |        tc.neighbor_id) AS rk
        |    FROM tq, tc WHERE tq.query_id <> tc.neighbor_id)
        |  WHERE rk <= 10),
        |n AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_truth
        |      FROM ft GROUP BY 1),
        |h AS (SELECT ft.query_id, CAST(count(*) AS BIGINT) AS n_hits
        |      FROM ft JOIN tt ON ft.query_id = tt.query_id
        |        AND ft.neighbor_id = tt.neighbor_id
        |      GROUP BY 1)
        |SELECT n.query_id, n.n_truth,
        |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) * 1000000.0
        |    / CAST(n.n_truth AS DOUBLE), 0) AS BIGINT) AS recall_micros
        |FROM n LEFT JOIN h ON n.query_id = h.query_id
        |ORDER BY n.query_id""".stripMargin,
    "x66_auc_eval" ->
      """WITH t AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS score,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT score, CAST(count(*) AS BIGINT) AS m,
        |    CAST(sum(y) AS BIGINT) AS npos
        |  FROM t GROUP BY score),
        |w AS (
        |  SELECT score, m, npos,
        |    CAST(coalesce(sum(m) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS c
        |  FROM g),
        |a AS (
        |  SELECT CAST(sum(npos * (2 * c + m + 1)) AS BIGINT) AS r2,
        |    CAST(sum(npos) AS BIGINT) AS np,
        |    CAST(sum(m - npos) AS BIGINT) AS nn
        |  FROM w)
        |SELECT np AS n_pos, nn AS n_neg,
        |  CASE WHEN np > 0 AND nn > 0 THEN
        |    CAST(round(CAST(r2 - np * (np + 1) AS DOUBLE) * 1000000.0
        |      / (2.0 * CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 0)
        |      AS BIGINT)
        |  ELSE NULL END AS auc_micros
        |FROM a""".stripMargin,
    "x65_concat_packing" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
        |      AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n,
        |    CAST(coalesce(sum(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS off
        |  FROM toks),
        |s AS (
        |  SELECT doc_id, n, off,
        |    unnest(generate_series(off // 128, (off + n - 1) // 128))
        |      AS seq_id
        |  FROM c WHERE n > 0)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(off, seq_id * 128) - off AS BIGINT) AS tok_start,
        |  CAST(greatest(off, seq_id * 128) - seq_id * 128 AS BIGINT)
        |    AS seq_off,
        |  CAST(least(off + n, (seq_id + 1) * 128)
        |    - greatest(off, seq_id * 128) AS BIGINT) AS n_toks
        |FROM s ORDER BY seq_id, doc_id""".stripMargin,
    "x64_gopher_rules" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text, tk,
        |    CAST(len(tk) AS BIGINT) AS words,
        |    CAST(coalesce(list_sum(list_transform(tk, t -> strlen(t))), 0)
        |      AS BIGINT) AS chars,
        |    CAST(len(regexp_extract_all(text, '#'))
        |      + len(regexp_extract_all(text, '\.\.\.'))
        |      + len(regexp_extract_all(text, '…')) AS BIGINT) AS sym,
        |    list_filter(string_split(text, chr(10)),
        |      l -> strlen(l) > 0) AS lines,
        |    CAST(len(list_filter(tk,
        |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alphaw,
        |    CAST(len(list_filter(['the', 'a', 'of'],
        |      s -> list_contains(tk, s))) AS BIGINT) AS stop
        |  FROM toks),
        |r AS (
        |  SELECT doc_id,
        |    words >= 30 AND words <= 80 AS r_word_count,
        |    chars >= 3 * words AND chars <= 10 * words AS r_mean_word_len,
        |    sym * 100 < 10 * words AS r_symbol_ratio,
        |    CAST(len(list_filter(lines, l -> starts_with(l, '•')
        |        OR starts_with(l, '- ') OR starts_with(l, '* ')))
        |      AS BIGINT) * 100
        |      < 90 * CAST(len(lines) AS BIGINT) AS r_bullet_lines,
        |    CAST(len(list_filter(lines, l -> ends_with(l, '...')
        |        OR ends_with(l, '…'))) AS BIGINT) * 100
        |      < 30 * CAST(len(lines) AS BIGINT) AS r_ellipsis_lines,
        |    alphaw * 100 >= 80 * words AS r_alpha_words,
        |    stop >= 2 AS r_stopwords
        |  FROM m)
        |SELECT doc_id, r_word_count, r_mean_word_len, r_symbol_ratio,
        |  r_bullet_lines, r_ellipsis_lines, r_alpha_words, r_stopwords,
        |  (r_word_count AND r_mean_word_len AND r_symbol_ratio
        |   AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
        |   AND r_stopwords) AS pass
        |FROM r ORDER BY doc_id""".stripMargin,
    "x60_rank_metrics" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |q AS (SELECT * FROM (VALUES ('join','merge'), ('merge','window'),
        |        ('scan','join'), ('window','scan')) v(query, rterm)),
        |tf AS (
        |  SELECT q.query, t.doc_id,
        |    CAST(len(list_filter(t.tk, x -> x = q.query)) AS BIGINT) AS qtf,
        |    CAST(least(len(list_filter(t.tk, x -> x = q.rterm)), 3)
        |      AS BIGINT) AS rel
        |  FROM toks t, q),
        |ranked AS (
        |  SELECT query, doc_id, rel, row_number() OVER (
        |    PARTITION BY query ORDER BY qtf DESC, doc_id) AS rank
        |  FROM tf WHERE qtf > 0),
        |topk AS (SELECT * FROM ranked WHERE rank <= 10),
        |dcg AS (
        |  SELECT query,
        |    CAST(sum(CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |      / log2(CAST(rank AS DOUBLE) + 1.0) * 1000000.0, 0)
        |      AS BIGINT)) AS BIGINT) AS dcg_micros,
        |    min(CASE WHEN rel > 0 THEN rank END) AS first_rel
        |  FROM topk GROUP BY query),
        |ideal AS (
        |  SELECT query, rel, row_number() OVER (
        |    PARTITION BY query ORDER BY rel DESC, doc_id) AS irank
        |  FROM tf WHERE rel > 0),
        |idcg AS (
        |  SELECT query,
        |    CAST(sum(CAST(round((pow(2.0, CAST(rel AS DOUBLE)) - 1.0)
        |      / log2(CAST(irank AS DOUBLE) + 1.0) * 1000000.0, 0)
        |      AS BIGINT)) AS BIGINT) AS idcg_micros
        |  FROM ideal WHERE irank <= 10 GROUP BY query)
        |SELECT d.query, d.dcg_micros,
        |  coalesce(i.idcg_micros, CAST(0 AS BIGINT)) AS idcg_micros,
        |  CASE WHEN coalesce(i.idcg_micros, 0) > 0
        |    THEN CAST(d.dcg_micros AS DOUBLE) / CAST(i.idcg_micros AS DOUBLE)
        |    ELSE 0.0 END AS ndcg,
        |  coalesce(CAST(round(1000000.0 / d.first_rel, 0) AS BIGINT),
        |    CAST(0 AS BIGINT)) AS mrr_micros
        |FROM dcg d LEFT JOIN idcg i USING (query)
        |ORDER BY query""".stripMargin,
    "x59_grouped_topk" ->
      """SELECT lang, CAST(rn AS INTEGER) AS rank, doc_id, n_chars
        |FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY lang, rank""".stripMargin,
    "x33_class_centroids" ->
      """SELECT label, CAST(p AS INTEGER) AS pos,
        |  CAST(sum(round(CAST(embedding[CAST(p + 1 AS INTEGER)] AS DOUBLE)
        |    * 1048576.0)) AS DOUBLE) / count(*) AS centroid_q
        |FROM embeddings, range(8) t(p)
        |GROUP BY label, p ORDER BY label, pos""".stripMargin,
    "x11_ann_bruteforce" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS qv
        |  FROM embeddings WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS neighbor_id,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS nv
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    list_inner_product(q.qv, c.nv) /
        |      (sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.nv, c.nv))) AS cos
        |  FROM q, c WHERE q.query_id <> c.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cos FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "x17_split_hash" ->
      """SELECT doc_id,
        |  (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 29791
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 961
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 31
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 < 10
        |    AS is_test
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x18_stratified_sample" ->
      """SELECT lang, CAST(least(count(*), 20) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "x21_dedup_components" ->
      """SELECT doc_id + k * 100000 AS id, doc_id AS component
        |FROM documents, range(13) t(k)
        |WHERE doc_id < 10 ORDER BY id""".stripMargin,
    "x20_curation_pipeline" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> w IN ('a', 'the'))) AS DOUBLE) AS nstop,
        |    CAST(length(text) AS DOUBLE) AS nchar
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, text,
        |    least(nchar / 500.0, 1.0) * 0.5
        |      + least(((nchar - (ntok - 1)) / ntok) / 8.0, 1.0) * 0.3
        |      + (1.0 - nstop / ntok) * 0.2 AS quality
        |  FROM t),
        |sc AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and','is'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('el','la','los','de','es'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('le','la','les','et','est'))) AS BIGINT) AS s_fr,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ('的','是','了','在','我'))) AS BIGINT) AS s_zh
        |  FROM documents),
        |pred AS (
        |  SELECT doc_id, CASE
        |    WHEN greatest(s_de,s_en,s_es,s_fr,s_zh) = 0 THEN 'und'
        |    WHEN s_de = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'de'
        |    WHEN s_en = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'en'
        |    WHEN s_es = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'es'
        |    WHEN s_fr = greatest(s_de,s_en,s_es,s_fr,s_zh) THEN 'fr'
        |    ELSE 'zh' END AS predicted
        |  FROM sc),
        |f AS (
        |  SELECT q.doc_id, q.text, p.predicted
        |  FROM q JOIN pred p ON q.doc_id = p.doc_id
        |  WHERE q.quality >= 0.5 AND p.predicted <> 'und'),
        |d AS (
        |  SELECT doc_id, predicted,
        |    row_number() OVER (
        |      PARTITION BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
        |      ORDER BY doc_id) AS rn
        |  FROM f)
        |SELECT doc_id, predicted,
        |  (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 29791
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 961
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 31
        |   + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 < 10
        |    AS is_test
        |FROM d WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "x19_weighted_mixture" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        |WHERE lang = 'en'
        |   OR (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 29791
        |       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 961
        |       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 31
        |       + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 < 25
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "x15_asof_join" ->
      """SELECT e.event_id, p.event_id AS purchase_event_id
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |     (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND p.ts <= e.ts
        |ORDER BY e.event_id""".stripMargin,
    "x13_multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
        |  CAST((SELECT sum(ascii(c)) FROM unnest(string_split_regex(text, '')) AS u(c)
        |        WHERE c <> '') AS BIGINT) AS byte_sum
        |FROM documents WHERE doc_id < 100
        |ORDER BY media_id""".stripMargin,
    "x14_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(f * 64 AS BIGINT) AS frame_offset
        |FROM documents, unnest(range(((strlen(text) - 1) // 64) + 1)) AS t(f)
        |WHERE doc_id < 10
        |ORDER BY media_id, frame_idx""".stripMargin,
    "x22_contamination" ->
      """WITH sp AS (
        |  SELECT doc_id, text,
        |    (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 29791
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) * 961
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 31
        |     + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 100 < 20
        |      AS is_test
        |  FROM documents),
        |tg AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(len(w) - 2),
        |      i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS gram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM sp
        |          WHERE is_test))),
        |trg AS (
        |  SELECT DISTINCT gram FROM (
        |    SELECT unnest(list_transform(range(len(w) - 2),
        |      i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS gram
        |    FROM (SELECT string_split(text, ' ') AS w FROM sp
        |          WHERE NOT is_test)))
        |SELECT tg.doc_id AS test_id,
        |  CAST(sum(CASE WHEN trg.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS shared_ngrams,
        |  CAST(count(*) AS BIGINT) AS test_ngrams,
        |  CAST(sum(CASE WHEN trg.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS contamination
        |FROM tg LEFT JOIN trg ON tg.gram = trg.gram
        |GROUP BY tg.doc_id HAVING shared_ngrams >= 1
        |ORDER BY test_id""".stripMargin,
    "x23_percentile_cut" ->
      """WITH thr AS (
        |  SELECT lang, round(quantile_cont(n_chars, 0.75) * 4) / 4 AS thr
        |  FROM documents GROUP BY lang)
        |SELECT d.lang, t.thr, CAST(count(*) AS BIGINT) AS n_keep,
        |  min(d.n_chars) AS min_chars, max(d.n_chars) AS max_chars
        |FROM documents d JOIN thr t ON d.lang = t.lang
        |WHERE CAST(d.n_chars AS DOUBLE) >= t.thr
        |GROUP BY d.lang, t.thr ORDER BY d.lang""".stripMargin,
    "x32_bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(trim(
        |    regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')), ' '))
        |    AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '''s|''t|''re|''ve|''m|''ll|''d| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+'))
        |    AS BIGINT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x30_sequence_packing" ->
      """WITH RECURSIVE seq AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT)
        |    AS n_tokens,
        |    CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM documents
        |), g(rn, acc, chunk) AS (
        |  SELECT CAST(1 AS BIGINT), (SELECT n_tokens FROM seq WHERE rn = 1),
        |    CAST(0 AS BIGINT)
        |  UNION ALL
        |  SELECT s.rn,
        |    CASE WHEN g.acc + s.n_tokens > 512 THEN s.n_tokens
        |         ELSE g.acc + s.n_tokens END,
        |    CASE WHEN g.acc + s.n_tokens > 512 THEN g.chunk + 1
        |         ELSE g.chunk END
        |  FROM g JOIN seq s ON s.rn = g.rn + 1
        |)
        |SELECT g.chunk AS pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(s.n_tokens) AS BIGINT) AS pack_tokens
        |FROM g JOIN seq s ON s.rn = g.rn
        |GROUP BY g.chunk ORDER BY pack_id""".stripMargin,
    "x28_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, w,
        |    list_transform(range(len(w) - 1),
        |      i -> concat(w[i+1], ' ', w[i+2])) AS g2,
        |    list_transform(range(len(w) - 2),
        |      i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3])) AS g3
        |  FROM t)
        |SELECT doc_id,
        |  1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
        |      / CAST(len(g2) AS DOUBLE) AS dup_2gram_ratio,
        |  1.0 - CAST(len(list_distinct(g3)) AS DOUBLE)
        |      / CAST(len(g3) AS DOUBLE) AS dup_3gram_ratio,
        |  CAST(list_max(list_transform(list_distinct(w),
        |      t -> len(list_filter(w, x -> x = t)))) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) AS top_token_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "x29_pii_redaction" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    concat('contact user', CAST(doc_id AS VARCHAR),
        |      '@mail', CAST(doc_id % 7 AS VARCHAR), '.com or 555-',
        |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'),
        |      '-1234 at 10.0.', CAST(doc_id % 256 AS VARCHAR), '.1 ',
        |      text) AS text
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT)
        |      AS n_emails,
        |    CAST(len(regexp_extract_all(text,
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text,
        |          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
        |        '<IP>', 'g'),
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |  FROM p)
        |SELECT doc_id, n_emails, n_phones,
        |  CAST(strlen(redacted) AS BIGINT) AS redacted_len,
        |  substr(redacted, 1, 60) AS redacted_head
        |FROM r ORDER BY doc_id""".stripMargin,
    "x27_mg_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |t AS (SELECT term FROM toks WHERE term <> '')
        |SELECT term, CAST(count(*) AS BIGINT) AS n
        |FROM t GROUP BY term
        |HAVING count(*) * 50 > (SELECT count(*) FROM t)
        |ORDER BY term""".stripMargin,
    "x26_tfidf_terms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM terms WHERE term <> '' GROUP BY doc_id, term),
        |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf
        |       GROUP BY term),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
        |      FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * n.n / CAST(df.df AS DOUBLE) AS score
        |  FROM tf JOIN df USING (term), n),
        |ranked AS (
        |  SELECT doc_id, term, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, tf, df, score
        |FROM ranked WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,
    "x25_heavy_hitters" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "x24_zorder_cells" ->
      """WITH b AS (
        |  SELECT l_partkey % 1024 AS x, l_suppkey % 1024 AS y FROM lineitem),
        |s1 AS (SELECT (x | (x << 8)) & 16711935 AS x,
        |              (y | (y << 8)) & 16711935 AS y FROM b),
        |s2 AS (SELECT (x | (x << 4)) & 252645135 AS x,
        |              (y | (y << 4)) & 252645135 AS y FROM s1),
        |s3 AS (SELECT (x | (x << 2)) & 858993459 AS x,
        |              (y | (y << 2)) & 858993459 AS y FROM s2),
        |s4 AS (SELECT (x | (x << 1)) & 1431655765 AS x,
        |              (y | (y << 1)) & 1431655765 AS y FROM s3)
        |SELECT ((x | (y << 1)) >> 14) AS cell, CAST(count(*) AS BIGINT) AS n
        |FROM s4 GROUP BY cell ORDER BY cell""".stripMargin,
    "x34_semdedup" ->
      """WITH u AS (
        |  SELECT vec_id AS id,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS v
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0))
        |  FROM embeddings WHERE vec_id < 25),
        |cent AS (
        |  SELECT vec_id AS cid,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT u.id, cent.cid,
        |    list_inner_product(u.v, cent.cv) /
        |      (sqrt(list_inner_product(u.v, u.v)) *
        |       sqrt(list_inner_product(cent.cv, cent.cv))) AS cos
        |  FROM u, cent),
        |asg AS (
        |  SELECT id, cid AS cluster FROM (
        |    SELECT id, cid,
        |      row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |m AS (SELECT a.cluster, a.id, u.v FROM asg a JOIN u ON a.id = u.id),
        |dup AS (
        |  SELECT DISTINCT b.id FROM m a JOIN m b
        |  ON a.cluster = b.cluster AND a.id < b.id
        |  WHERE list_inner_product(a.v, b.v) /
        |    (sqrt(list_inner_product(a.v, a.v)) *
        |     sqrt(list_inner_product(b.v, b.v))) >= 0.99)
        |SELECT CAST(m.cluster AS BIGINT) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(count(dup.id) AS BIGINT) AS n_dups
        |FROM m LEFT JOIN dup ON m.id = dup.id
        |GROUP BY m.cluster ORDER BY cluster""".stripMargin,
    "x35_ann_int8" ->
      """WITH c AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS sc
        |  FROM c),
        |q8 AS (
        |  SELECT vec_id, sc,
        |    CASE WHEN sc = 0
        |      THEN list_transform(v, x -> CAST(0 AS DOUBLE))
        |      ELSE list_transform(v, x -> round(x / sc)) END AS qv
        |  FROM s),
        |scored AS (
        |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |    (q.sc * n.sc) * list_inner_product(q.qv, n.qv) AS score
        |  FROM q8 q JOIN q8 n ON q.vec_id <> n.vec_id
        |  WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, score FROM ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "x37_bpe_pair_freqs" ->
      """SELECT pair, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT unnest(list_transform(range(len(w) - 1),
        |    i -> concat(w[i+1], ' ', w[i+2]))) AS pair
        |  FROM (SELECT string_split(text, ' ') AS w FROM documents))
        |GROUP BY pair ORDER BY n DESC, pair LIMIT 30""".stripMargin,
    "x38_epoch_shuffle" ->
      """SELECT doc_id, pos FROM (
        |  SELECT doc_id, CAST(row_number() OVER (
        |    ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
        |    AS BIGINT) AS pos
        |  FROM documents)
        |WHERE pos < 100 ORDER BY pos""".stripMargin,
    "x36_dup_ngrams" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id, unnest(list_transform(range(len(w) - 2),
        |      i -> concat(w[i+1], ' ', w[i+2], ' ', w[i+3]))) AS gram
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))),
        |c AS (SELECT gram, count(*) AS docs FROM g GROUP BY gram),
        |p AS (
        |  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN c.docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |  FROM g JOIN c USING (gram) GROUP BY g.doc_id)
        |SELECT d.doc_id, COALESCE(p.n_grams, 0) AS n_grams,
        |  COALESCE(p.n_shared, 0) AS n_shared,
        |  CASE WHEN COALESCE(p.n_grams, 0) = 0 THEN NULL
        |       ELSE CAST(p.n_shared AS DOUBLE) / CAST(p.n_grams AS DOUBLE) END
        |    AS dup_coverage
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "x39_kmeans_step" ->
      """WITH p AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1048576.0)) AS qv
        |  FROM embeddings),
        |cent AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
        |    qv AS cv
        |  FROM (SELECT vec_id, qv FROM p ORDER BY vec_id LIMIT 8)),
        |scored AS (
        |  SELECT p.vec_id, cent.cid,
        |    list_inner_product(p.qv, cent.cv) /
        |      (sqrt(list_inner_product(p.qv, p.qv)) *
        |       sqrt(list_inner_product(cent.cv, cent.cv))) AS cos
        |  FROM p, cent),
        |asg AS (
        |  SELECT vec_id, cid AS cluster FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        |    FROM scored) WHERE rn = 1),
        |m AS (SELECT a.cluster, e.embedding
        |      FROM asg a JOIN embeddings e USING (vec_id))
        |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(t.p AS INTEGER) AS pos,
        |  CAST(sum(round(CAST(embedding[CAST(t.p + 1 AS INTEGER)] AS DOUBLE)
        |    * 1048576.0)) AS BIGINT) AS comp_sum,
        |  CAST(count(*) AS BIGINT) AS n_members
        |FROM m, range(8) t(p)
        |GROUP BY cluster, t.p ORDER BY cluster, pos""".stripMargin,
    "x40_stratified_hash_sample" ->
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin,
    "x43_media_resize" ->
      """WITH b AS (
        |  SELECT doc_id AS media_id, text, strlen(text) AS n
        |  FROM documents WHERE doc_id < 100)
        |SELECT media_id, CAST(n AS BIGINT) AS n_bytes,
        |  CAST(sum(ascii(text[CAST(i * n // 16 + 1 AS INTEGER)])) AS BIGINT)
        |    AS resized_sum
        |FROM b, range(16) t(i)
        |WHERE n > 0
        |GROUP BY media_id, n ORDER BY media_id""".stripMargin,
    "x42_incremental_dedup" ->
      """WITH corpus AS (
        |  SELECT md5(text) AS fp FROM documents
        |  WHERE doc_id < 400 AND text IS NOT NULL),
        |inc AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50),
        |inc1 AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text, row_number() OVER (
        |      PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM inc WHERE text IS NOT NULL) WHERE rn = 1)
        |SELECT i.doc_id FROM inc1 i
        |WHERE md5(i.text) NOT IN (SELECT fp FROM corpus)
        |ORDER BY doc_id""".stripMargin,
    "x41_bpe_learn" ->
      """WITH wr AS (
        |  SELECT unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
        |    ' ')) AS w
        |  FROM documents),
        |t0 AS (
        |  SELECT list_transform(range(length(w)), i -> w[i+1]) AS toks
        |  FROM wr WHERE length(w) > 0),
        |p1 AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS pair FROM t0),
        |m1 AS (
        |  SELECT pair, CAST(count(*) AS BIGINT) AS n,
        |    string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
        |  FROM p1 GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
        |t1 AS (
        |  SELECT string_split(list_reduce(toks, (acc, x) -> CASE
        |      WHEN x = m1.b AND (acc = m1.a
        |        OR right(acc, length(m1.a) + 1) = ' ' || m1.a)
        |      THEN acc || x ELSE acc || ' ' || x END), ' ') AS toks
        |  FROM t0, m1),
        |p2 AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS pair FROM t1),
        |m2 AS (
        |  SELECT pair, CAST(count(*) AS BIGINT) AS n,
        |    string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
        |  FROM p2 GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
        |t2 AS (
        |  SELECT string_split(list_reduce(toks, (acc, x) -> CASE
        |      WHEN x = m2.b AND (acc = m2.a
        |        OR right(acc, length(m2.a) + 1) = ' ' || m2.a)
        |      THEN acc || x ELSE acc || ' ' || x END), ' ') AS toks
        |  FROM t1, m2),
        |p3 AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS pair FROM t2),
        |m3 AS (
        |  SELECT pair, CAST(count(*) AS BIGINT) AS n
        |  FROM p3 GROUP BY pair ORDER BY n DESC, pair LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS rank, pair, n FROM m1
        |UNION ALL SELECT CAST(2 AS BIGINT), pair, n FROM m2
        |UNION ALL SELECT CAST(3 AS BIGINT), pair, n FROM m3
        |ORDER BY rank""".stripMargin,
    "x44_bpe_apply" ->
      """WITH wr AS (
        |  SELECT doc_id,
        |    unnest(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')),
        |      ' ')) AS w
        |  FROM documents),
        |d0 AS (
        |  SELECT doc_id, list_transform(range(length(w)), i -> w[i+1]) AS toks
        |  FROM wr WHERE length(w) > 0),
        |t0 AS (SELECT toks FROM d0),
        |p1 AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS pair FROM t0),
        |m1 AS (
        |  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
        |  FROM (SELECT pair, count(*) AS n FROM p1 GROUP BY pair
        |        ORDER BY n DESC, pair LIMIT 1)),
        |d1 AS (
        |  SELECT doc_id, string_split(list_reduce(toks, (acc, x) -> CASE
        |      WHEN x = m1.b AND (acc = m1.a
        |        OR right(acc, length(m1.a) + 1) = ' ' || m1.a)
        |      THEN acc || x ELSE acc || ' ' || x END), ' ') AS toks
        |  FROM d0, m1),
        |p2 AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS pair FROM d1),
        |m2 AS (
        |  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
        |  FROM (SELECT pair, count(*) AS n FROM p2 GROUP BY pair
        |        ORDER BY n DESC, pair LIMIT 1)),
        |d2 AS (
        |  SELECT doc_id, string_split(list_reduce(toks, (acc, x) -> CASE
        |      WHEN x = m2.b AND (acc = m2.a
        |        OR right(acc, length(m2.a) + 1) = ' ' || m2.a)
        |      THEN acc || x ELSE acc || ' ' || x END), ' ') AS toks
        |  FROM d1, m2),
        |p3 AS (
        |  SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i+1] || ' ' || toks[i+2])) AS pair FROM d2),
        |m3 AS (
        |  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b
        |  FROM (SELECT pair, count(*) AS n FROM p3 GROUP BY pair
        |        ORDER BY n DESC, pair LIMIT 1)),
        |d3 AS (
        |  SELECT doc_id, string_split(list_reduce(toks, (acc, x) -> CASE
        |      WHEN x = m3.b AND (acc = m3.a
        |        OR right(acc, length(m3.a) + 1) = ' ' || m3.a)
        |      THEN acc || x ELSE acc || ' ' || x END), ' ') AS toks
        |  FROM d2, m3)
        |SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_words
        |FROM d3 GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x54_segment_dedup" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0
        |      THEN 'begin legal boilerplate header notice of all rights ' ||
        |           'reserved end ' || text
        |      ELSE text END AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM base WHERE doc_id < 20),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM corpus),
        |occ AS (SELECT doc_id, unnest(tk) AS term,
        |          generate_subscripts(tk, 1) AS i FROM toks),
        |segocc AS (SELECT doc_id, (i - 1) // 10 AS seg_idx, term, i FROM occ),
        |segs AS (SELECT doc_id, seg_idx,
        |           string_agg(term, ' ' ORDER BY i) AS seg
        |         FROM segocc GROUP BY doc_id, seg_idx),
        |kept AS (SELECT doc_id, seg_idx, seg FROM (
        |           SELECT doc_id, seg_idx, seg, row_number() OVER (
        |             PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
        |           FROM segs) WHERE rn = 1),
        |reass AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |            string_agg(seg, ' ' ORDER BY seg_idx) AS text
        |          FROM kept GROUP BY doc_id),
        |nsegs AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments
        |          FROM segs GROUP BY doc_id)
        |SELECT c.doc_id,
        |  coalesce(n.n_segments, CAST(0 AS BIGINT)) AS n_segments,
        |  coalesce(r.n_kept, CAST(0 AS BIGINT)) AS n_kept,
        |  coalesce(r.text, '') AS text
        |FROM (SELECT DISTINCT doc_id FROM corpus) c
        |LEFT JOIN nsegs n USING (doc_id)
        |LEFT JOIN reass r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "x55_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
        |  FROM documents),
        |occ AS (SELECT doc_id, unnest(tk) AS term,
        |          generate_subscripts(tk, 1) AS i FROM toks),
        |bg AS (SELECT a.doc_id, a.term AS ctx, b.term AS nxt
        |       FROM occ a JOIN occ b
        |       ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        |bc AS (SELECT ctx, nxt, CAST(count(*) AS BIGINT) AS cnt
        |       FROM bg GROUP BY ctx, nxt),
        |cc AS (SELECT ctx, CAST(sum(cnt) AS BIGINT) AS ccnt
        |       FROM bc GROUP BY ctx),
        |voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM occ),
        |tf AS (SELECT doc_id, ctx, nxt, CAST(count(*) AS BIGINT) AS tf
        |       FROM bg GROUP BY doc_id, ctx, nxt),
        |comp AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round((tf.tf * ln(CAST(bc.cnt + 1 AS DOUBLE) /
        |      CAST(cc.ccnt + voc.v AS DOUBLE))) * 1000000.0, 0)
        |      AS BIGINT) AS cm
        |  FROM tf JOIN bc USING (ctx, nxt) JOIN cc USING (ctx), voc)
        |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cm) AS BIGINT) AS lp_micros
        |FROM comp GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
