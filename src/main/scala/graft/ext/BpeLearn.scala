package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE merge-rule LEARNING (Sennrich et al. 2016) — the vocabulary-
  * construction side of the tokenizer surface ([[TextAnalysis]] counts
  * pieces with a FIXED pre-tokenizer; this learns the merge table
  * itself): start from characters, repeatedly merge the most frequent
  * adjacent token pair.
  *
  * Distributed shape: each round is ONE pair-count aggregation over the
  * corpus (map-side combined; key space = observed pairs) and a `LIMIT
  * 1` argmax — no driver-side corpus state, no per-word Python-style
  * loops. Applying a learned merge is a greedy left-to-right fold per
  * word expressed as a codegen-friendly `aggregate` lambda over the
  * token array. Rounds chain linearly (each round's tokenization is a
  * projection over the previous round's — linear lineage, no
  * self-joins); for vocabularies of thousands of merges at 100 TB,
  * checkpoint the tokenized corpus every few hundred rounds.
  *
  * Determinism: count ties break to the lexicographically smallest
  * `"a b"` pair string, so the learned table is a pure function of the
  * corpus — the DuckDB oracle replays the identical fold via
  * `list_reduce`.
  */
object BpeLearn {

  /** The word-frequency state BPE actually learns from: one row per
    * DISTINCT word with its corpus frequency, the word char-split into a
    * space-joined token string (tokens never contain spaces, so the
    * string faithfully encodes the token list). Learning over distinct
    * words instead of word occurrences is the published scalable form —
    * pair counts weight by `freq`, every later pass costs |vocab| not
    * |corpus| — and is exactly equivalent (merges apply uniformly to
    * identical words).
    */
  def initialTokens(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat_ws(" ", array_remove(split(col("w"), ""), "")).as("tok"),
        col("freq"))

  /** Greedy left-to-right application of one merge rule `(a, b)` to a
    * space-joined token string: fold tokens into the accumulator,
    * joining WITHOUT the space separator exactly when the accumulator's
    * last token is `a` and the incoming token is `b`. Merging updates
    * the last token to `a+b`, so an overlapping occurrence (e.g. "a a a"
    * under rule (a,a)) correctly does not re-merge — the standard BPE
    * scan.
    */
  def applyMerge(tokStr: Column, a: String, b: String): Column =
    aggregate(split(tokStr, " "), lit(""), (acc, x) =>
      when(acc === "", x)
        .when(x === lit(b) &&
            (acc === lit(a) || acc.endsWith(lit(" " + a))),
          concat(acc, x))
        .otherwise(concat(acc, lit(" "), x)))

  /** Adjacent-pair counts of the current tokenization, weighted by word
    * frequency (equals per-occurrence counting over the raw corpus).
    */
  def pairCounts(tokenized: DataFrame): DataFrame =
    tokenized.select(split(col("tok"), " ").as("_toks"), col("freq"))
      .select(explode(TextAnalysis.adjacentPairsOver(col("_toks"))).as("pair"),
        col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))

  /** Learn the first `merges` merge rules. Returns `(rank, pair, n)` —
    * the rule learned at each round and its frequency at selection time.
    * Stops early if the corpus runs out of adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: Column,
                  merges: Int): Seq[(Long, String, Long)] = {
    // each round's vocabulary is cached so round r folds ONLY merge r
    // over round r-1's materialized state — without this the linear
    // lineage re-runs every earlier fold each round (quadratic in the
    // number of merges). The cache materializes as a side effect of the
    // round's pair-count action; the previous round's cache is released
    // one round later. At cluster scale swap the cache for a checkpoint
    // every few hundred rounds.
    var tokenized = initialTokens(docs, textCol).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var prev: Option[DataFrame] = None
    val out = Seq.newBuilder[(Long, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = pairCounts(tokenized)
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        out += ((r.toLong, pair, top(0).getLong(1)))
        val Array(a, b) = pair.split(" ", 2)
        prev = Some(tokenized)
        tokenized = tokenized
          .select(applyMerge(col("tok"), a, b).as("tok"), col("freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      r += 1
    }
    prev.foreach(_.unpersist(blocking = false))
    tokenized.unpersist(blocking = false)
    out.result()
  }

  /** [[learnMerges]] as a DataFrame `(rank, pair, n)` for gate/oracle
    * comparison.
    */
  def learnMergesDF(docs: DataFrame, textCol: Column,
                    merges: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    learnMerges(docs, textCol, merges).toDF("rank", "pair", "n")
  }

  /** APPLY side of the tokenizer: tokenize the corpus with an ordered
    * merge table (chars, then each merge's greedy fold in rank order —
    * exactly the BPE apply algorithm) and report per-document token and
    * word counts. One pass, no joins: the merge table folds into the
    * projection as nested expressions, so a 100 TB tokenization is a
    * single scan. For vocabularies of thousands of merges, apply in
    * chunks of a few hundred folds with a checkpoint between chunks
    * (same lineage discipline as [[learnMerges]]).
    */
  def tokenCounts(docs: DataFrame, idCol: Column, textCol: Column,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(idCol.as("doc_id"), explode(TextAnalysis.tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"),
        concat_ws(" ", array_remove(split(col("w"), ""), "")).as("tok"))
    val folded = merges.foldLeft(col("tok")) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    words.select(col("doc_id"), size(split(folded, " ")).cast("long").as("_n"))
      .groupBy("doc_id")
      .agg(sum(col("_n")).as("n_tokens"), count(lit(1)).as("n_words"))
  }
}
