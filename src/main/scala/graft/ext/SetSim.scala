package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join (all pairs with token-set Jaccard ≥ τ) via
  * prefix filtering — the AllPairs/PPJoin family (Bayardo et al. 2007,
  * "Scaling Up All Pairs Similarity Search"; Xiao et al. 2008). The
  * LSH/MinHash path ([[Dedup.minhashCandidates]]) is probabilistic —
  * it misses pairs with probability (1−j^r)^b; this operator is the
  * exact complement for when recall must be 1.0 (contamination scrubs,
  * eval-set leakage), at the cost of a candidate set that grows with
  * token co-occurrence rather than hash collisions.
  *
  * The pruning argument: order every token by (global df, token) —
  * rarest first — and sort each doc's tokens in that order. If
  * J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·|A|⌉, so A and B must share a token in
  * their first |·| − ⌈τ·|·|⌉ + 1 tokens (the PREFIX): a pair sharing
  * only suffix tokens cannot reach the overlap bound. Candidates are
  * generated from the prefix self-join only, and rare-first ordering
  * makes prefixes the lowest-df tokens — the self-join blows up on a
  * token only if many docs share a RARE token, which is exactly when
  * they are plausibly similar.
  *
  * Scale shape: one shuffle for the df count, one doc-keyed window for
  * prefix positions (per-doc groups, bounded by doc length), one
  * token-keyed candidate self-join (the prefix filter keeps this far
  * below the full |tok|² blowup on realistic Zipfian vocabularies), a
  * distinct, and a verify phase that counts shared tokens per candidate
  * pair ((id, tok) rows, map-side combined) instead of joining full
  * token arrays onto every pair. The length filter
  * (100·|A| ≥ τ%·|B|) prunes candidates before the distinct. All
  * comparisons are integer cross-multiplications — no float thresholds
  * — so a DuckDB brute-force oracle matches bit-exactly.
  */
object SetSim {

  /** Distinct whitespace tokens per id: `(id, toks, n)`. */
  private def tokenSets(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.cast("long").as("id"),
        array_distinct(split(text, " ")).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("n"))

  /** All pairs `(id_a < id_b)` with Jaccard(tokens(a), tokens(b)) ≥
    * `tauPct`/100, with the exact intersection and union sizes.
    * Output: `(id_a, id_b, inter, uni)`.
    */
  def jaccardJoin(docs: DataFrame, id: Column, text: Column,
                  tauPct: Int): DataFrame = {
    require(tauPct > 0 && tauPct <= 100, "tauPct in (0,100]")
    val toks = tokenSets(docs, id, text)
    verifyPairs(candidatesFromPrefix(prefixTable(toks, tauPct), tauPct),
      toks, tauPct)
  }

  /** Rare-first prefix rows `(id, n, tok)`: position by (df, tok) within
    * each doc; prefix length n − ⌈τ·n⌉ + 1 (integer ceil:
    * (τ%·n + 99) div 100).
    */
  private def prefixTable(toks: DataFrame, tauPct: Int): DataFrame = {
    val exploded = toks
      .select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
    exploded.join(freq, "tok")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("n") - expr(s"($tauPct * n + 99) div 100") + 1)
      .select(col("id"), col("n"), col("tok"))
  }

  /** Candidate pairs: prefixes sharing a token + the length filter
    * (J ≥ τ ⇒ τ·|B| ≤ |A| when |A| ≤ |B|).
    */
  private def candidatesFromPrefix(prefix: DataFrame, tauPct: Int): DataFrame =
    prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id") &&
        lit(100L) * col("a.n") >= lit(tauPct.toLong) * col("b.n") &&
        lit(100L) * col("b.n") >= lit(tauPct.toLong) * col("a.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

  /** [[jaccardJoinCapped]]'s result: the surviving pairs plus a LOUD
    * record of every prefix bucket the cap dropped — `(tok,
    * prefix_docs)`, one row per hot token. Empty `dropped` ⇒ the result
    * equals the exact [[jaccardJoin]].
    */
  final case class CappedSimJoin(pairs: DataFrame, dropped: DataFrame)

  /** [[jaccardJoin]] with a per-token candidate budget — the
    * adversarial-corpus guard. The prefix self-join generates
    * C(bucket, 2) candidates for a token shared by `bucket` prefixes;
    * one token in 10k prefixes is 50M candidate pairs before the
    * distinct. Capping drops any prefix bucket wider than `maxPerTok`
    * BEFORE pairing (the `maxPerFp` device from
    * [[Winnowing.sharedPassages]]), bounding the join at
    * Σ C(min(bucket, cap), 2) — and, unlike a silent cutoff, returns
    * the dropped buckets so the caller can alert, re-shard, or fall
    * back to [[sortedNeighborhoodJoin]] (whose candidate budget is
    * linear regardless of skew) for the affected docs.
    *
    * NOT exact when `dropped` is non-empty: a pair whose ONLY shared
    * prefix token was dropped is missed. That is the documented trade —
    * the exact join is still [[jaccardJoin]]; this is what you point at
    * a corpus you don't control.
    */
  def jaccardJoinCapped(docs: DataFrame, id: Column, text: Column,
                        tauPct: Int, maxPerTok: Int): CappedSimJoin = {
    require(tauPct > 0 && tauPct <= 100, "tauPct in (0,100]")
    require(maxPerTok >= 1, "maxPerTok must be >= 1")
    val toks = tokenSets(docs, id, text)
    // at 100 TB persist `prefix` before the two passes below; at gate
    // scale the double computation is cheaper than the cache round-trip
    val prefix = prefixTable(toks, tauPct)
    val dropped = prefix.groupBy("tok")
      .agg(count(lit(1)).as("prefix_docs"))
      .filter(col("prefix_docs") > maxPerTok)
    val kept = prefix.join(dropped.select("tok"), Seq("tok"), "left_anti")
    CappedSimJoin(
      verifyPairs(candidatesFromPrefix(kept, tauPct), toks, tauPct),
      dropped)
  }

  /** Exact-Jaccard verification of candidate `(id_a, id_b)` pairs via
    * exploded-token co-count — candidate pairs expand to (pair, token)
    * ROWS joined on (id_b, tok), never shipping whole token ARRAYS per
    * candidate. At 100 TB the array variant duplicates every document's
    * token set across the shuffle once per candidate pair; the
    * co-count's shuffle rows are narrow (two longs + one token) and
    * map-side combined by the aggregate. Emits
    * `(id_a, id_b, inter, uni)` for pairs with J ≥ `tauPct`/100.
    */
  private def verifyPairs(cands: DataFrame, toks: DataFrame,
                          tauPct: Int): DataFrame = {
    val exploded = toks.select(col("id"), explode(col("toks")).as("tok"))
    val ea = exploded.select(col("id").as("id_a"), col("tok"))
    val eb = exploded.select(col("id").as("id_b"), col("tok"))
    val inter = cands
      .join(ea, "id_a")
      .join(eb, Seq("id_b", "tok"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    val sizes = toks.select(col("id"), col("n"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("_na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("inter").cast("long").as("inter"),
        (col("_na") + col("_nb") - col("inter")).cast("long").as("uni"))
      .filter(col("inter") * 100L >= lit(tauPct.toLong) * col("uni"))
  }

  /** Sorted-neighborhood near-dup join (Hernández & Stolfo 1995): order
    * the corpus by a canonical blocking key (the doc's sorted-token
    * string), take every pair within `window` positions of each other as
    * a candidate, verify exact Jaccard ≥ `tauPct`/100. The classic
    * complement to hash blocking: catches near-dups whose canonical
    * forms SORT together (shared low tokens) with a linear candidate
    * budget — n·window pairs regardless of how skewed token frequencies
    * are, where prefix filtering can blow up on a hot rare token.
    *
    * Scale shape: the global position comes from
    * [[graft.ingest.Ingest.withPosition]] (range partition + exact
    * per-partition offsets — no single-partition global window), and the
    * neighborhood self-join is an equi-join on `pos div window` buckets
    * (each position joins its own and the next bucket), so candidate
    * generation is shuffle-bounded by n·2 rows, pairs by n·window.
    * Output: `(id_a, id_b, inter, uni)` with id_a < id_b.
    */
  def sortedNeighborhoodJoin(docs: DataFrame, id: Column, text: Column,
                             window: Int, tauPct: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(tauPct > 0 && tauPct <= 100, "tauPct in (0,100]")
    val toks = tokenSets(docs, id, text)
    val keyed = toks.withColumn("_key",
      array_join(sort_array(col("toks")), " "))
    val positioned = graft.ingest.Ingest.withPosition(
        keyed.select(col("id"), col("_key")),
        Seq(col("_key"), col("id")), as = "pos")
      // integral `div`, not `/`: matches the repo's all-integer discipline
      // (pos is non-negative, so div == floor-division here)
      .select(col("id"), col("pos"), expr(s"pos div $window").as("b"))
    // the later row of a pair also lands in the PREVIOUS bucket, so a
    // pair with j − i ≤ window meets whether j shares i's bucket or sits
    // in the next one
    val left = positioned.select(col("id").as("id_a"), col("pos").as("_pa"),
      col("b"))
    val right = positioned.select(col("id").as("id_b"), col("pos").as("_pb"),
        explode(array(col("b"), col("b") - 1)).as("b"))
    val cands = left.join(right,
        left("b") === right("b") &&
          col("_pb") > col("_pa") && col("_pb") <= col("_pa") + window)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()
    verifyPairs(cands, toks, tauPct)
  }

  /** Candidate-pair count before verification — exposed so tests can
    * assert the prefix filter actually prunes versus the full cross
    * product.
    */
  def candidateCount(docs: DataFrame, id: Column, text: Column,
                     tauPct: Int): Long = {
    val toks = tokenSets(docs, id, text)
    val exploded = toks
      .select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
    val prefix = exploded.join(freq, "tok")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("n") - expr(s"($tauPct * n + 99) div 100") + 1)
      .select(col("id"), col("n"), col("tok"))
    prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id") &&
        lit(100L) * col("a.n") >= lit(tauPct.toLong) * col("b.n") &&
        lit(100L) * col("b.n") >= lit(tauPct.toLong) * col("a.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .count()
  }
}
