package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines, each designed for the
  * 100 TB shuffle budget:
  *
  *  - exact: one hash-shuffle on the content key, map-side partial agg;
  *  - MinHash+LSH: shingle → k minhashes → band buckets → bucket-local
  *    join (candidate generation never goes quadratic globally — only
  *    within a bucket);
  *  - SimHash: 64-bit signature, banded into 16-bit keys for bucketing
  *    (Hamming-distance candidates without pairwise scans);
  *  - n-gram Jaccard: exact verification metric for candidate pairs;
  *  - embedding cosine: random-hyperplane buckets then bucket-local
  *    pairwise cosine.
  *
  * All signature computation is pure `functions._` expressions
  * (codegen'd, no UDFs); only candidate joins shuffle, keyed on buckets.
  */
object Dedup {

  /** Normalize text for near-exact matching: lowercase, collapse
    * whitespace, trim.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Exact deduplication on a content key: keep the minimum id per key
    * (deterministic canonical choice), count duplicates. Single shuffle.
    */
  def exact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(keyCol.as("_key"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("copies"))

  // ---------- MinHash + LSH ----------

  private val P = 2305843009213693951L // 2^61 - 1 (Mersenne prime)

  /** Deterministic hash-family parameters (aᵢ odd, < 2^20 so aᵢ·x never
    * overflows a Long for x < 2^31).
    */
  private def hashParams(numHashes: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(20260812L)
    val as = Seq.fill(numHashes)((rnd.nextInt(1 << 19).toLong << 1) | 1L)
    val bs = Seq.fill(numHashes)(rnd.nextInt(1 << 30).toLong)
    (as, bs)
  }

  /** MinHash signature (array of `numHashes` longs) over shingles.
    * shingle → xxhash64 → fold to 2^31 space → min over shingles of
    * (aⱼ·x + bⱼ) mod P per hash j.
    *
    * `shingleK` > 0 selects character k-shingles (robust to small edits;
    * the right default for natural text); `wordGrams` > 0 selects word
    * n-gram shingles instead (the right choice when documents share a
    * small vocabulary and differ mainly in word order).
    */
  def minhashSignature(text: Column, numHashes: Int = 32, shingleK: Int = 5,
                       wordGrams: Int = 0): Column =
    signatureOverHashes(shingleHashes(text, shingleK, wordGrams), numHashes)

  /** Hashed shingles of a text column (one xxhash64 pass per shingle).
    * Materialize this once (its own projection) before the signature
    * kernel consumes it.
    */
  def shingleHashes(text: Column, shingleK: Int = 5, wordGrams: Int = 0): Column = {
    val shingles =
      if (wordGrams > 0) TextAnalysis.wordNgrams(text, wordGrams)
      else TextAnalysis.charShingles(text, shingleK)
    transform(shingles, s => xxhash64(s))
  }

  /** MinHash signature from a pre-computed shingle-hash array column —
    * the fused codegen kernel (graft.functions.MinHashFromHashes): all
    * `numHashes` minima in one primitive loop instead of `numHashes`
    * interpreted aggregate() folds.
    */
  def signatureOverHashes(hashes: Column, numHashes: Int = 32): Column = {
    val (as, bs) = hashParams(numHashes)
    graft.functions.SketchFunctions.minhash_from_hashes(hashes, numHashes, as, bs)
  }

  /** Banded signature rows: (id, band, band_hash) — `bands` rows per
    * document; equal band_hash within a band ⇒ candidate pair. One
    * explode, no join yet.
    */
  def minhashBands(df: DataFrame, idCol: Column, textCol: Column,
                   numHashes: Int = 32, bands: Int = 8, shingleK: Int = 5,
                   wordGrams: Int = 0): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // staged projections so each expensive array is computed once per row:
    // tokens -> shingle hashes -> signature -> band hashes. (An expression
    // subtree referenced inside a higher-order lambda re-evaluates per
    // element, so every stage must hand the next one a plain attribute.)
    val hashed =
      if (wordGrams > 0)
        df.select(idCol.as("id"), TextAnalysis.tokens(textCol).as("_t"))
          .select(col("id"), transform(
            TextAnalysis.wordNgramsOver(col("_t"), wordGrams),
            s => xxhash64(s)).as("_sh"))
      else
        df.select(idCol.as("id"),
          shingleHashes(textCol, shingleK, wordGrams).as("_sh"))
    hashed
      .select(col("id"), signatureOverHashes(col("_sh"), numHashes).as("sig"))
      .select(col("id"), posexplode(array((0 until bands).map { b =>
        xxhash64(slice(col("sig"), b * r + 1, r))
      }: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_hash"))
  }

  /** LSH candidate pairs: bucket-join on (band, band_hash), id_a < id_b,
    * distinct. The join key includes the band index so buckets stay
    * small; skew-prone giant buckets are AQE's skew-join case.
    */
  def minhashCandidates(df: DataFrame, idCol: Column, textCol: Column,
                        numHashes: Int = 32, bands: Int = 8, shingleK: Int = 5,
                        wordGrams: Int = 0): DataFrame = {
    // cache: the self-join would otherwise recompute every signature
    // twice. MEMORY_ONLY so eviction under pressure is cheap; callers
    // running dedup repeatedly in a long-lived session should
    // materialize bands themselves (minhashBands) and unpersist.
    val banded = minhashBands(df, idCol, textCol, numHashes, bands, shingleK,
      wordGrams).persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Estimated Jaccard from signature agreement, for candidate scoring. */
  def signatureSimilarity(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => (x === y).cast("int")),
      v => v === 1)).cast("double") / size(sigA).cast("double")

  // ---------- SimHash ----------

  /** 64-bit SimHash over whitespace tokens: per token take xxhash64,
    * accumulate ±1 per bit position, sign → bit. Returned as a Long.
    * Counter accumulation runs in the fused codegen kernel
    * (graft.functions.SimHash64FromHashes) — one primitive loop instead
    * of a 64-wide array zip per token.
    */
  def simhash64(text: Column): Column =
    graft.functions.SketchFunctions.simhash_from_hashes(
      transform(TextAnalysis.tokens(text), t => xxhash64(t)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")

  /** SimHash near-dup candidates: band the 64 bits into four 16-bit keys;
    * two docs within Hamming distance 3 share at least one key
    * (pigeonhole). Bucket-join, then exact Hamming verify ≤ `maxDist`.
    */
  def simhashCandidates(df: DataFrame, idCol: Column, textCol: Column,
                        maxDist: Int = 3): DataFrame = {
    val sigs = df.select(idCol.as("id"), simhash64(textCol).as("sig"))
    val banded = sigs.select(col("id"), col("sig"), posexplode(
        array((0 until 4).map { b =>
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))
        }: _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "band_key"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  // ---------- n-gram Jaccard ----------

  /** Exact Jaccard similarity of distinct word n-gram sets. */
  def ngramJaccard(textA: Column, textB: Column, n: Int): Column = {
    val ga = array_distinct(TextAnalysis.wordNgrams(textA, n))
    val gb = array_distinct(TextAnalysis.wordNgrams(textB, n))
    val inter = size(array_intersect(ga, gb)).cast("double")
    inter / (size(ga) + size(gb) - size(array_intersect(ga, gb))).cast("double")
  }

  // ---------- embedding cosine near-dup ----------

  /** Near-duplicate pairs by embedding cosine ≥ `minCos`: random-
    * hyperplane bucket (Similarity.hyperplaneBucket) then bucket-local
    * pairwise cosine — candidate generation is linear + bucket-quadratic,
    * never globally quadratic.
    */
  def embeddingNearDup(df: DataFrame, idCol: Column, vecCol: Column,
                       minCos: Double = 0.95, planes: Int = 8): DataFrame = {
    val bucketed = df.select(idCol.as("id"), vecCol.as("vec"),
      Similarity.hyperplaneBucket(vecCol, planes).as("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosineFloat(col("a.vec"), col("b.vec")).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
