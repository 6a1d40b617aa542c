package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language identification, and document fingerprinting.
  *
  * Everything is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — fully codegen'd, no UDFs, so these
  * run inside WholeStageCodegen over 100 TB without serialization
  * boundaries. (The reference has no text operators; these extend its
  * declared ETL surface per the north star — BASELINE.json.)
  */
object TextAnalysis {

  /** Whitespace tokenization (single-space collapsed first). */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(text, "\\s+", " ")), " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** GPT-2-style pre-tokenizer pattern (the BPE-ish split: contractions,
    * space-prefixed letter runs, digit runs, punctuation runs, residual
    * whitespace), restricted to lookahead-free constructs so the SAME
    * pattern runs under Java regex and RE2 (DuckDB/Go engines) with
    * identical leftmost-first semantics. Whitespace is an EXPLICIT class
    * — Java's `\s` includes U+000B while RE2's does not, so the
    * shorthand would silently diverge on vertical tabs.
    */
  val BpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[a-zA-Z]+| ?[0-9]+" +
      "| ?[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+"

  /** BPE-ish token count: the number of pre-tokenizer pieces — the unit
    * a subword tokenizer's cost scales with, and the standard
    * token-budget estimate when the real vocabulary is not on the
    * cluster.
    */
  def bpeTokenCount(text: Column): Column = countPattern(text, BpePattern)

  // ---- *Over variants take a pre-materialized token array column so a
  // multi-metric projection tokenizes each row once, not once per metric.

  def tokenCountOver(toks: Column): Column = size(toks).cast("long")

  def avgTokenLenOver(toks: Column, textLen: Column): Column =
    (textLen - (size(toks) - lit(1))).cast("double") / size(toks).cast("double")

  def stopwordRatioOver(toks: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      size(toks).cast("double")
  }

  def qualityScoreOver(toks: Column, textLen: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(textLen.cast("double") / lit(500.0), lit(1.0))
    val wordScore = least(avgTokenLenOver(toks, textLen) / lit(8.0), lit(1.0))
    (lenScore * lit(0.5) + wordScore * lit(0.3) +
      (lit(1.0) - stopwordRatioOver(toks, stopwords)) * lit(0.2))
  }

  def charCount(text: Column): Column = length(text).cast("long")

  /** Average token length under single-space joining:
    * (chars - (n-1)) / n, one exact integer division to double.
    */
  def avgTokenLen(text: Column): Column = {
    val n = size(tokens(text))
    ((length(text) - (n - lit(1))).cast("double") / n.cast("double"))
  }

  /** Ratio of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val stops = array(stopwords.map(lit): _*)
    val hits = size(filter(tokens(text), t => array_contains(stops, t)))
    hits.cast("double") / size(tokens(text)).cast("double")
  }

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / length(text).cast("double")

  /** Ratio of uppercase characters. */
  def upperRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[A-Z]", "")))
      .cast("double") / length(text).cast("double")

  /** Composite quality score in [0,1]-ish: rewards reasonable length and
    * word shape, penalizes extreme stopword density. Deliberately simple,
    * deterministic arithmetic (cross-engine reproducible).
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val wordScore = least(avgTokenLen(text) / lit(8.0), lit(1.0))
    val stopPenalty = stopwordRatio(text, stopwords)
    (lenScore * lit(0.5) + wordScore * lit(0.3) +
      (lit(1.0) - stopPenalty) * lit(0.2))
  }

  /** Language-ID marker words per language — a tiny stopword-profile
    * n-gram heuristic (real pipelines plug in fastText/CLD here; the
    * operator shape — score per language, argmax — is the same).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "los", "de", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def markerHitsOver(toks: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(m, t)))
  }

  /** Per-language marker-hit counts as one array column (same order as
    * LangMarkers), computed by the fused `marker_counts` kernel: ONE
    * token pass with a shared token→language lookup instead of one
    * interpreted `filter(array_contains)` walk per language. Materialize
    * this in its own projection before argmax — every downstream
    * reference then reads an attribute.
    */
  def langScoresOver(toks: Column): Column =
    graft.functions.SketchFunctions.marker_counts(toks, LangMarkers.map(_._2))

  /** The composed-HOF reference implementation of `langScoresOver` —
    * kept for differential testing of the fused kernel.
    */
  def langScoresOverComposed(toks: Column): Column =
    array(LangMarkers.map { case (_, ms) =>
      markerHitsOver(toks, ms).cast("long") }: _*)

  /** Argmax over a materialized score array: ties broken by language code
    * order, "und" when no marker hits.
    */
  def langIdFromScores(scores: Column): Column = {
    val best = array_max(scores)
    LangMarkers.zipWithIndex.foldRight(lit("und")) { case (((lang, _), i), acc) =>
      when(element_at(scores, i + 1) === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Predicted language (single-expression sugar; hot paths should stage
    * tokens → langScoresOver → langIdFromScores as separate projections).
    */
  def langId(text: Column): Column =
    langIdFromScores(langScoresOver(tokens(text)))

  private val Mod = 1000000007L

  /** Order-insensitive bag fingerprint: Σ ascii(first char)·len(token)
    * mod p. Cheap, associative (aggregates in any partition order), and
    * expressible in ANSI SQL for the oracle.
    */
  def bagFingerprint(text: Column): Column =
    pmod(aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ascii(t) * length(t)), lit(Mod)).cast("long")

  /** Order-sensitive rolling hash: h ← (h·131 + ascii(t)·31 + len(t)) mod p.
    * Left fold over tokens — detects token reordering that the bag
    * fingerprint misses.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (h, t) => pmod(h * lit(131L) + ascii(t) * lit(31L) + length(t), lit(Mod)))
      .cast("long")

  /** Character k-shingles: the length-k substrings (k-grams) of the text,
    * one per starting offset.
    */
  def charShingles(text: Column, k: Int): Column =
    transform(sequence(lit(0), greatest(length(text) - lit(k), lit(0))),
      i => text.substr(i + lit(1), lit(k)))

  /** Word n-grams over a pre-materialized token array column. The token
    * column MUST be a plain attribute (its own projection): an expression
    * subtree referenced inside a higher-order lambda is re-evaluated per
    * element, which turns shingling quadratic.
    *
    * A document with fewer than n tokens has NO n-grams (empty array) —
    * the `range(len - n + 1)` semantics every SQL oracle of the gram
    * pipelines encodes — not one truncated gram.
    */
  def wordNgramsOver(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - lit(n)),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))

  /** Word n-grams as space-joined strings (single-expression sugar; for
    * hot paths project `tokens(text)` first and use `wordNgramsOver`).
    */
  def wordNgrams(text: Column, n: Int): Column = wordNgramsOver(tokens(text), n)

  /** Adjacent-token pairs over a pre-staged token array — the corpus
    * statistic a BPE/WordPiece merge step ranks (most frequent adjacent
    * pair becomes the next merge): `zip(toks, toks[1:])` as space-joined
    * strings. Empty for single-token documents.
    */
  def adjacentPairsOver(toks: Column): Column =
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1), (a, b) => concat_ws(" ", a, b)))

  /** Duplicate n-gram ratio over a pre-staged token array: 1 −
    * distinct/total — the Gopher-style intra-document repetition signal
    * (high ratio ⇒ boilerplate / looping text). Pure array expressions,
    * one pass per row.
    */
  def dupNgramRatioOver(toks: Column, n: Int): Column = {
    val grams = wordNgramsOver(toks, n)
    lit(1.0) - size(array_distinct(grams)).cast("double") /
      size(grams).cast("double")
  }

  /** Fraction of all tokens taken by the single most frequent token —
    * the companion repetition signal. The count is the one-pass fused
    * kernel (graft.functions.TopTokenCount): the composable form was
    * O(distinct·n) interpreted dispatches plus a filtered-array
    * allocation per distinct token per document — the worst per-row
    * asymptotics in the text-kernel family. Bit-identical (integer
    * count, same double division), pinned in Round8PropSpec;
    * [[topTokenRatioOverComposable]] is the executable oracle.
    */
  def topTokenRatioOver(toks: Column): Column =
    graft.functions.SketchFunctions.top_token_count(toks)
      .cast("double") / size(toks).cast("double")

  /** The composable-HOF twin of [[topTokenRatioOver]] — kept as the
    * differential-spec oracle.
    */
  private[graft] def topTokenRatioOverComposable(toks: Column): Column =
    aggregate(array_distinct(toks), lit(0),
      (acc, t) => greatest(acc, size(filter(toks, x => x === t))))
      .cast("double") / size(toks).cast("double")

  /** Count of non-overlapping matches of `pattern` in `text`. */
  def countPattern(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** PII scrub: emails, simple phone shapes and IPv4 literals replaced
    * by typed placeholder tags. Patterns deliberately use only
    * character-class syntax shared by every mainstream regex dialect
    * (no lookaround, no \d shorthands), so an external engine can audit
    * the redaction byte-for-byte.
    */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** PII span audit: one row per detected span, `(doc_id, kind, idx,
    * span)` with `idx` the 1-based occurrence number of that kind
    * within the document — the inventory a compliance review wants
    * BEFORE [[redactPii]] rewrites the text (what was found, where,
    * how often), and the differential check that redaction removed
    * exactly what detection saw.
    *
    * Scale: map-side only — per-kind `regexp_extract_all` staged once
    * per document, then two generator expressions (kind, occurrence);
    * output is bounded by match count, documents with no PII emit
    * nothing.
    */
  def piiSpans(docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val kinds = Seq("email" -> EmailPattern, "phone" -> PhonePattern,
      "ipv4" -> Ipv4Pattern)
    val staged = docs.select(idCol.as("doc_id"),
      array(kinds.map { case (k, p) =>
        struct(lit(k).as("kind"),
          regexp_extract_all(textCol, lit(p), lit(0)).as("spans"))
      }: _*).as("_kinds"))
    staged
      .select(col("doc_id"), explode(col("_kinds")).as("_k"))
      .select(col("doc_id"), col("_k.kind").as("kind"),
        posexplode(col("_k.spans")).as(Seq("_i", "span")))
      .select(col("doc_id"), col("kind"),
        (col("_i") + 1).cast("long").as("idx"), col("span"))
  }

  /** Vocabulary coverage / out-of-vocabulary rate: build the top-
    * `vocabSize` corpus vocabulary (by frequency, ties by term — fully
    * deterministic) and score each document's OOV token fraction in
    * micros. The tokenizer-independent coverage diagnostic: a source
    * whose documents sit far out-of-vocabulary relative to the corpus
    * bulk is foreign-language, encoding-damaged, or boilerplate-coded,
    * and OOV rate is the standard pre-tokenizer health check before
    * committing a vocab budget.
    *
    * Scale: one (term)-keyed count agg for the vocabulary (top-K plans
    * as TakeOrderedAndProject — per-partition heads, no global sort),
    * which then BROADCASTS (≤ vocabSize rows) onto the exploded token
    * stream — the corpus shuffles once on doc_id for the per-doc agg,
    * never on the join.
    */
  def vocabCoverage(docs: DataFrame, idCol: Column, textCol: Column,
                    vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = docs.select(idCol.as("doc_id"),
      explode(filter(tokens(textCol), t => t =!= "")).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("_in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("_oov"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("_oov").cast("double") * lit(1000000.0)
          / col("n_tokens").cast("double"), 0).cast("long").as("oov_micros"))
  }

  /** Per-document character-level Shannon entropy (micros) — the
    * compression-proxy quality signal: boilerplate and repeated filler
    * sit LOW (few characters dominate), encoded noise and binary
    * spillage sit HIGH (near-uniform byte use); both tails are cut in
    * web-corpus curation (the entropy twin of the repetition and
    * symbol-ratio rules).
    *
    * H = ln n − (Σ_c k_c·ln k_c) / n over character counts k_c. Each
    * component k·ln k quantizes to micros BEFORE the per-doc sum
    * (integer addition is order-free → the sum is engine-exact under
    * any partitioning), and the final `/n` is one correctly-rounded
    * IEEE division — the x49/x68 portability device. Documents with
    * empty text have no defined entropy and drop.
    *
    * Scale: the postings shape — one (doc, char)-keyed agg with
    * map-side partials (state bounded by alphabet size per doc), one
    * doc-keyed agg. No windows, no driver state.
    */
  def charEntropy(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs
      .filter(length(textCol) > 0)
      .select(idCol.as("doc_id"),
        // Java split keeps a trailing "" under limit −1 — drop empties
        // so character counts agree with any sane splitter
        explode(filter(split(textCol, ""), c => c =!= "")).as("ch"))
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n"),
        sum(round(col("k").cast("double") * log(col("k").cast("double"))
          * lit(1000000.0), 0).cast("long")).as("_s_micros"))
      .select(col("doc_id"), col("n"),
        (round(log(col("n").cast("double")) * lit(1000000.0), 0).cast("long")
          - round(col("_s_micros").cast("double") / col("n").cast("double"), 0)
            .cast("long")).as("entropy_micros"))

  /** Sliding-window token chunking with overlap — the standard training
    * prep for splitting long documents into model-context-sized windows
    * (window `w`, stride `s` < `w` ⇒ consecutive chunks overlap by
    * `w − s` tokens, so no span is ever cut off at a boundary it
    * doesn't also appear inside).
    *
    * Output: `(doc_id, chunk_id, chunk, chunk_len)` — one row per
    * window; the final partial window is kept (standard behavior; cap
    * via `chunk_len` downstream if a minimum is needed).
    *
    * Scale: ZERO shuffles — tokenize, start-offset generation
    * (`sequence`), slice and join are all codegen'd array lambdas, so
    * this runs entirely map-side over any corpus size; output order
    * within a document is by construction `chunk_id`.
    */
  def slidingChunks(docs: DataFrame, idCol: Column, textCol: Column,
                    window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(idCol.as("doc_id"),
        filter(tokens(textCol), t => t =!= "").as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(when(size(col("_toks")) > 0,
            sequence(lit(0), size(col("_toks")) - 1, lit(stride)))
          .otherwise(array().cast("array<int>"))).as("_start"))
      .select(col("doc_id"),
        (col("_start") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("_toks"), col("_start") + 1, lit(window)), " ")
          .as("chunk"),
        size(slice(col("_toks"), col("_start") + 1, lit(window))).cast("long")
          .as("chunk_len"))
  }

  /** Top-k distinguishing terms per document, TF-IDF-shaped: score =
    * tf · (N / df) — term frequency times inverse document frequency as
    * a plain ratio rather than the textbook log(N/df). The ranking is
    * identical for a single-term ordering (x ↦ log x is monotone); the
    * ratio keeps the score ONE exact IEEE division on integer-valued
    * doubles, so any engine reproduces the ordering bit-for-bit — the
    * same portability trade as the quantized cosine in `Similarity`.
    *
    * Plan shape: one explode + two hash aggregations (per-(doc,term) tf,
    * per-term df), one join keyed on the term, and a window PARTITIONED
    * by document for the top-k — every stage keyed, nothing global.
    */
  def topDistinguishingTerms(docs: DataFrame, idCol: Column, textCol: Column,
                             k: Int = 3): DataFrame = {
    val terms = docs
      .select(idCol.as("doc_id"), explode(tokens(textCol)).as("term"))
      .filter(col("term") =!= "")
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(idCol).distinct().count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("score",
        col("tf").cast("double") * lit(n.toDouble) / col("df").cast("double"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("term"), col("tf"), col("df"), col("score"))
  }
}
