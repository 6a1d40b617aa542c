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
  * token array. Each round `localCheckpoint`s the tokenized vocabulary
  * (one projection per round over materialized state — flat plan, flat
  * lineage, no self-joins); [[learnMergesBatched]] cuts the driver
  * round-trips ~batch× for real vocabulary sizes.
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
    *
    * DEFAULT = the batched learner: at a 50k-merge production vocabulary
    * the one-driver-round-trip-per-merge sequential loop is 50k Spark
    * jobs, so the scale path has to be the default. Output-equivalence
    * to the sequential form is differential-pinned (Round5ExtSpec), and
    * the sequential loop survives as [[learnMergesSequential]] — the
    * executable spec oracle.
    */
  def learnMerges(docs: DataFrame, textCol: Column, merges: Int,
                  batch: Int = 8): Seq[(Long, String, Long)] =
    learnMergesBatched(docs, textCol, merges, batch)

  /** The textbook one-merge-per-round loop: each round collects exactly
    * ONE (pair, count) row and launches one distributed fold. Driver
    * cost is O(merges) tiny collects — fine to a few thousand merges,
    * and the simplest-possible oracle the batched learner is
    * differential-tested against; production learning goes through
    * [[learnMerges]] (batched).
    */
  def learnMergesSequential(docs: DataFrame, textCol: Column,
                            merges: Int): Seq[(Long, String, Long)] = {
    // each round's vocabulary is localCheckpoint'ed so round r folds
    // ONLY merge r over round r-1's MATERIALIZED state with a truncated
    // logical plan — a lazy cache keeps the data but the plan still
    // chains every earlier fold, and at hundreds of merges Catalyst
    // analysis + plan rendering (not execution) become the bottleneck.
    // Superseded rounds are unpersisted as the loop advances.
    var tokenized = initialTokens(docs, textCol).localCheckpoint()
    val out = Seq.newBuilder[(Long, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = pairCounts(tokenized)
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        out += ((r.toLong, pair, top(0).getLong(1)))
        val Array(a, b) = pair.split(" ", 2)
        val prev = tokenized
        tokenized = tokenized
          .select(applyMerge(col("tok"), a, b).as("tok"), col("freq"))
          .localCheckpoint()
        org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(prev)
      }
      r += 1
    }
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(tokenized)
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

  /** BATCHED merge learning: one driver round-trip learns up to `batch`
    * merges, cutting the sequential learner's one-job-per-merge driver
    * loop ~batch× — the known hard part of distributed BPE (a 30k-merge
    * vocabulary is 30k sequential Spark jobs otherwise).
    *
    * Output-EQUIVALENT to [[learnMerges]], not an approximation: each
    * round collects the top-K pair counts and takes the longest prefix
    * (in the same `n` desc, lexicographic tie order) that provably
    * commutes with sequential selection —
    *
    *  - candidates must be pairwise TOKEN-DISJOINT: merging `(a,b)`
    *    cannot create or destroy occurrences of a pair sharing no token
    *    with it, so every later candidate's count is literally unchanged
    *    when its turn comes;
    *  - a candidate stops the batch if its count does not STRICTLY
    *    exceed the best possible count of any pair a previous selection
    *    could CREATE — a created pair `(x, ab)` inherits at most the old
    *    count of `(x, a)` (and `(ab, y)` at most `(b, y)`), so that
    *    bound is the max count among collected candidates sharing a
    *    token with a selection, or the collection cutoff for pairs
    *    below it;
    *  - a selection whose merged token string collides with an existing
    *    candidate token also stops the batch (the collision conflates
    *    counts the sequential learner would see separately).
    *
    * The first candidate of a round is always taken, so the worst case
    * degrades to the sequential learner, never past it.
    * [[Round5ExtSpec]] differential-tests batched ≡ sequential.
    */
  def learnMergesBatched(docs: DataFrame, textCol: Column, merges: Int,
                         batch: Int = 8): Seq[(Long, String, Long)] =
    learnMergesBatchedStats(docs, textCol, merges, batch).merges

  /** [[learnMergesBatched]] plus its driver-round-trip count — `rounds`
    * is the number of collect-and-fold cycles actually paid, the metric
    * that distinguishes the batched learner from one-job-per-merge
    * (spec-pinned: a 500-merge vocabulary learns in far fewer than 500
    * rounds).
    */
  final case class BatchedLearn(merges: Seq[(Long, String, Long)], rounds: Int)

  def learnMergesBatchedStats(docs: DataFrame, textCol: Column, merges: Int,
                              batch: Int = 8): BatchedLearn = {
    require(batch >= 1, "batch must be >= 1")
    var rounds = 0
    var tokenized = initialTokens(docs, textCol).localCheckpoint()
    // the driver KNOWS the full token vocabulary at every point: the
    // initial tokens are single characters (one bounded collect) and
    // every later token is a merge this loop itself created. That exact
    // knowledge replaces the old guard's unconditional `+ cutoff`
    // collision padding — which priced in a conflation that can only
    // happen when the merged string already IS a token — with a set
    // lookup; on corpora with tight top counts the padding forced the
    // batch to end after one merge (near-sequential round-trips,
    // measured in bpe_sweep_r10).
    val vocab = scala.collection.mutable.Set.empty[String]
    vocab ++= tokenized
      .select(explode(split(col("tok"), " ")).as("t")).distinct()
      .collect().map(_.getString(0))
    val out = Seq.newBuilder[(Long, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      rounds += 1
      val k = math.max(batch * 16, 64)
      val rows = pairCounts(tokenized)
        .orderBy(col("n").desc, col("pair")).limit(k).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      if (rows.isEmpty) exhausted = true
      else {
        // counts below the collection cutoff are invisible; any such
        // pair (and any pair a merge creates out of one) is bounded by
        // the last collected count
        val cutoff = if (rows.length < k) 0L else rows.last._2
        val sides = rows.map { case (p, n) =>
          val Array(a, b) = p.split(" ", 2); (p, a, b, n)
        }
        val selected = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var guard = Long.MinValue // max count any applied merge could create
        var stop = false
        var i = 0
        while (!stop && i < sides.length && selected.size < math.min(batch, merges - rank + 1)) {
          val (pair, a, b, n) = sides(i)
          val merged = a + b
          if (selected.nonEmpty &&
              (n <= guard || used.contains(a) || used.contains(b))) {
            stop = true
          } else {
            selected += ((pair, a, b, n))
            used += a; used += b
            val sharing = sides.collect {
              case (p2, c, d, n2) if p2 != pair &&
                (c == a || c == b || d == a || d == b) => n2
            }
            // a pair this merge creates inherits at most the count of an
            // old pair sharing a token: collected → sharing.max,
            // uncollected → below the cutoff. (The old +cutoff term
            // covered conflation with an existing `merged` token's
            // unseen pairs; the vocab check below now rules that case
            // out exactly.)
            guard = math.max(guard,
              math.max(cutoff, if (sharing.isEmpty) 0L else sharing.max))
            // merged-token collision: `merged` already exists in the
            // vocabulary, so counts for pairs touching it would conflate
            // with the existing token's — end the batch here (the
            // selection ITSELF is still the exact argmax)
            if (vocab.contains(merged)) stop = true
            vocab += merged
          }
          i += 1
        }
        selected.foreach { case (pair, _, _, n) =>
          out += ((rank.toLong, pair, n)); rank += 1
        }
        val prev = tokenized
        tokenized = tokenized
          .select(selected.foldLeft(col("tok")) {
            case (c, (_, a, b, _)) => applyMerge(c, a, b)
          }.as("tok"), col("freq"))
          .localCheckpoint()
        org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(prev)
      }
    }
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(tokenized)
    BatchedLearn(out.result(), rounds)
  }

  /** [[learnMergesBatched]] as a DataFrame `(rank, pair, n)`. */
  def learnMergesBatchedDF(docs: DataFrame, textCol: Column, merges: Int,
                           batch: Int = 8): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    learnMergesBatched(docs, textCol, merges, batch).toDF("rank", "pair", "n")
  }

  /** APPLY side of the tokenizer: tokenize the corpus with an ordered
    * merge table (chars, then each merge's greedy fold in rank order —
    * exactly the BPE apply algorithm) and report per-document token and
    * word counts. One pass, no joins: the merge table folds into the
    * projection as nested expressions, so a 100 TB tokenization is a
    * single scan. For vocabularies of thousands of merges use
    * [[tokenCountsChunked]] — one nested expression per merge is fine
    * at gate sizes but Catalyst analysis cost grows with the fold
    * depth.
    */
  /** Per-(doc, word) char-split rows — the shared preparation stage of
    * both apply forms (their output-identity contract depends on it
    * being ONE definition).
    */
  private def wordRows(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs
      .select(idCol.as("doc_id"), explode(TextAnalysis.tokens(textCol)).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"),
        concat_ws(" ", array_remove(split(col("w"), ""), "")).as("tok"))

  private def countTokens(words: DataFrame): DataFrame =
    words.select(col("doc_id"),
        size(split(col("tok"), " ")).cast("long").as("_n"))
      .groupBy("doc_id")
      .agg(sum(col("_n")).as("n_tokens"), count(lit(1)).as("n_words"))

  def tokenCounts(docs: DataFrame, idCol: Column, textCol: Column,
                  merges: Seq[(String, String)]): DataFrame = {
    val words = wordRows(docs, idCol, textCol)
    val folded = merges.foldLeft(col("tok")) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    countTokens(words.select(col("doc_id"), folded.as("tok")))
  }

  /** [[tokenCounts]] for REAL vocabulary sizes: the merge table applies
    * in chunks of `chunk` greedy folds with a `localCheckpoint` between
    * chunks — each chunk is one projection over materialized state, so
    * the Catalyst plan (and its analysis cost) stays bounded by `chunk`
    * no matter how many thousand merges the vocabulary carries, exactly
    * the lineage discipline of [[learnMerges]]. Output-identical to
    * [[tokenCounts]] (fold order is preserved; chunking only cuts
    * where the plan materializes — spec-pinned in BpeLearnSpec).
    */
  def tokenCountsChunked(docs: DataFrame, idCol: Column, textCol: Column,
                         merges: Seq[(String, String)],
                         chunk: Int = 128): DataFrame = {
    require(chunk >= 1, "chunk must be >= 1")
    var words = wordRows(docs, idCol, textCol)
    val checkpoints = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    merges.grouped(chunk).foreach { group =>
      val folded = group.foldLeft(col("tok")) {
        case (c, (a, b)) => applyMerge(c, a, b)
      }
      words = words.select(col("doc_id"), folded.as("tok")).localCheckpoint()
      checkpoints += words
    }
    val out = countTokens(words).localCheckpoint()
    // every intermediate chunk is released; the RETURNED counts stay
    // checkpointed for reuse — call [[release]] once consumed
    checkpoints.foreach(org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint)
    out
  }

  /** Release the checkpointed blocks behind a [[tokenCountsChunked]]
    * result once it has been consumed.
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.GraftColumnBridge.unpersistCheckpoint(df)
}
