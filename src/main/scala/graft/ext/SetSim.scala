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
  * distinct, and one id-keyed verify join. The length filter
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

    val exploded = toks
      .select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))

    // Rare-first prefix: position by (df, tok) within each doc; prefix
    // length n − ⌈τ·n⌉ + 1 (integer ceil: (τ%·n + 99) div 100).
    val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
    val prefix = exploded.join(freq, "tok")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("n") - expr(s"($tauPct * n + 99) div 100") + 1)
      .select(col("id"), col("n"), col("tok"))

    // Candidate pairs: prefixes sharing a token + the length filter
    // (J ≥ τ ⇒ τ·|B| ≤ |A| when |A| ≤ |B|).
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.tok") === col("b.tok") &&
        col("a.id") < col("b.id") &&
        lit(100L) * col("a.n") >= lit(tauPct.toLong) * col("b.n") &&
        lit(100L) * col("b.n") >= lit(tauPct.toLong) * col("a.n"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()

    // Verify: exact intersection over the full sets, integer threshold.
    cands
      .join(toks.select(col("id").as("id_a"), col("toks").as("_ta"),
        col("n").as("_na")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("_tb"),
        col("n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("_ta"), col("_tb"))).cast("long").as("inter"),
        col("_na"), col("_nb"))
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("_na") + col("_nb") - col("inter")).cast("long").as("uni"))
      .filter(col("inter") * 100L >= lit(tauPct.toLong) * col("uni"))
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
