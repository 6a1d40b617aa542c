package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 (Okapi / Lucene variant) full-text retrieval over a document
  * corpus — the standard lexical ranking function for search and for
  * retrieval-based training-data curation (e.g. finding corpus documents
  * relevant to a benchmark prompt before decontamination review).
  *
  * Scale design (the part that matters at 100 TB):
  *   - the postings build is ONE explode + ONE aggregation keyed on
  *     `(doc_id, term)` — a single shuffle over token occurrences;
  *   - per-doc length `dl` is computed MAP-SIDE from the token array
  *     (a codegen'd lambda), not via a second per-doc aggregation;
  *   - at query time the exploded terms are pruned with `isin(query)`
  *     BEFORE the shuffle, so per-query cost is proportional to the
  *     matching postings, not the corpus;
  *   - the per-term document frequencies for a query are a handful of
  *     rows — Catalyst broadcasts them back onto the postings;
  *   - corpus constants (N, avgdl) are one scalar aggregate pass,
  *     collected once and inlined as literals so scoring stays inside
  *     WholeStageCodegen;
  *   - top-k is `orderBy(...).limit(k)` → `TakeOrderedAndProject`,
  *     never a global sort.
  *
  * The reference has no retrieval surface; this extends its ETL/query
  * contract per the north-star extensions (BASELINE.json). Formula:
  * Lucene's BM25 — idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
  * tf-norm = tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)).
  */
object Bm25 {

  private def cleanTokens(textCol: Column): Column =
    filter(TextAnalysis.tokens(textCol), t => t =!= "")

  /** Per-(doc, term) postings rows `(doc_id, term, tf, dl)`.
    *
    * @param termFilter when given, occurrences are pruned to these terms
    *   BEFORE the `(doc_id, term)` shuffle — the query-time fast path.
    *   `dl` stays the FULL document length either way (BM25's length
    *   normalization is over the whole document, not the matched terms).
    */
  def postings(docs: DataFrame, idCol: Column, textCol: Column,
               termFilter: Option[Seq[String]] = None): DataFrame = {
    val occ = docs
      .select(idCol.as("doc_id"), cleanTokens(textCol).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).cast("long").as("dl"),
        explode(col("_toks")).as("term"))
    val pruned = termFilter.fold(occ)(ts => occ.filter(col("term").isin(ts: _*)))
    pruned.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** Corpus constants in ONE aggregate pass: (n_docs, avgdl). Fails
    * fast on an empty corpus — `avg` over zero rows is NULL and avgdl=0
    * would divide by zero in the tf normalization; a clear error beats
    * an opaque NPE at unbox time.
    */
  def corpusStats(docs: DataFrame, textCol: Column): (Long, Double) = {
    val row = docs
      .select(size(cleanTokens(textCol)).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
      .head()
    require(row.getLong(0) > 0L && !row.isNullAt(1),
      "BM25 corpus is empty: no documents to compute (n_docs, avgdl) over")
    val avgdl = row.getDouble(1)
    require(avgdl > 0.0,
      "BM25 corpus has no tokens: avgdl = 0 would divide by zero")
    (row.getLong(0), avgdl)
  }

  /** Per-(doc, matched term) BM25 components
    * `(doc_id, term, tf, df, dl, component)`. Deterministic map-side
    * arithmetic after the postings shuffle — callers that need an
    * order-independent exact total (e.g. the driver gate) can quantize
    * `component` per row before summing.
    */
  def scoredTerms(docs: DataFrame, idCol: Column, textCol: Column,
                  queryTerms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 query needs at least one term")
    val post = postings(docs, idCol, textCol, Some(queryTerms))
    val df = post.groupBy("term").agg(count(lit(1)).as("df"))
    val (n, avgdl) = corpusStats(docs, textCol)
    val idf = log(lit(1.0) +
      (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    post.join(broadcast(df), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        (idf * tfNorm).as("component"))
  }

  /** Top-k documents for a bag-of-words query: `(doc_id, n_terms, score)`,
    * ties broken by doc_id for determinism.
    */
  def topK(docs: DataFrame, idCol: Column, textCol: Column,
           queryTerms: Seq[String], k: Int = 10,
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoredTerms(docs, idCol, textCol, queryTerms, k1, b)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("component")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)

  // ---------- build-once model (the Ivf.Model analog) ----------

  /** The corpus statistics BM25 actually needs at query time, built in
    * ONE corpus pass and reusable across every query: full postings
    * `(doc_id, term, tf, dl)`, per-term document frequencies
    * `(term, df)`, and the scalars (n, avgdl). At 100 TB the corpus
    * pass is the expensive part — you pay it once per corpus (or per
    * ingestion increment), not once per query, exactly like
    * [[Ivf.Model]]'s centroid/index split.
    */
  final case class Model(n: Long, avgdl: Double,
                         df: DataFrame, postings: DataFrame)

  /** One corpus pass (plus one scalar aggregate) → [[Model]]. The df
    * table derives from the postings aggregate, not a second corpus
    * scan.
    */
  def buildModel(docs: DataFrame, idCol: Column, textCol: Column): Model = {
    val post = postings(docs, idCol, textCol)
    val df = post.groupBy("term").agg(count(lit(1)).as("df"))
    val (n, avgdl) = corpusStats(docs, textCol)
    Model(n, avgdl, df, post)
  }

  /** Persist a model: postings range-clustered on `term` (row-group
    * min/max skipping serves the per-query `term isin (...)` filter),
    * df and the scalars as small side tables.
    */
  def writeModel(model: Model, path: String): Unit = {
    model.postings
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    model.df.write.mode("overwrite").parquet(s"$path/df")
    val s = model.df.sparkSession
    import s.implicits._
    Seq((model.n, model.avgdl)).toDF("n", "avgdl")
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  def readModel(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val stats = spark.read.parquet(s"$path/stats").head()
    Model(stats.getLong(0), stats.getDouble(1),
      spark.read.parquet(s"$path/df"),
      spark.read.parquet(s"$path/postings"))
  }

  /** [[scoredTerms]] against a prebuilt [[Model]] — identical arithmetic
    * and identical output (df/tf/dl/n/avgdl are the same quantities),
    * but the per-query plan touches ONLY the model tables: a
    * term-filtered postings scan (pushed to the parquet reader on a
    * written model) plus a broadcast of the handful of query-term df
    * rows. No corpus scan anywhere in the query plan — spec-pinned.
    */
  def scoredTermsModel(model: Model, queryTerms: Seq[String],
                       k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 query needs at least one term")
    val post = model.postings.filter(col("term").isin(queryTerms: _*))
    val df = model.df.filter(col("term").isin(queryTerms: _*))
    val idf = log(lit(1.0) +
      (lit(model.n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(model.avgdl)))
    post.join(broadcast(df), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        (idf * tfNorm).as("component"))
  }

  /** [[topK]] against a prebuilt [[Model]]. */
  def topKModel(model: Model, queryTerms: Seq[String], k: Int = 10,
                k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoredTermsModel(model, queryTerms, k1, b)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("component")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
}
