package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ingest.Positional

/** Pretraining concat-and-chunk sequence packing: concatenate every
  * document's tokens in a global order and cut the stream into
  * fixed-length training sequences, letting documents straddle sequence
  * boundaries (the GPT-style dataloader layout — contrast with
  * [[graft.ingest.Chunker]] greedy packing, which keeps whole documents
  * and leaves tail slack).
  *
  * Output is the LAYOUT manifest `(seq_id, doc_id, tok_start, seq_off,
  * n_toks)` — one row per (sequence, document-slice): enough for a
  * loader to assemble any sequence by reading its slices, and for
  * attention-reset masks (slice boundaries are document boundaries).
  *
  * Scale design: the only distributed ordering primitive is
  * [[Positional.ranged]] — range-partition by the id, ONE shared shuffle
  * for the stats and data passes, per-partition token totals (a few
  * longs) prefix-summed on the driver; the slice emission itself is a
  * map-side per-partition walk. No global window, no single-task
  * bottleneck, and a document's slice rows are emitted where the
  * document lives.
  */
object ConcatPacking {

  /** Cut points for one document occupying global token span
    * `[off, off+n)` against sequences of length `seqTokens`:
    * one row per sequence the span touches.
    */
  private def slices(off: Long, n: Long, seqTokens: Long):
      Iterator[(Long, Long, Long, Long)] = {
    if (n <= 0L) Iterator.empty
    else {
      val first = off / seqTokens
      val last = (off + n - 1L) / seqTokens
      (first to last).iterator.map { s =>
        val start = math.max(off, s * seqTokens)
        val end = math.min(off + n, (s + 1L) * seqTokens)
        (s, start - off, start - s * seqTokens, end - start)
      }
    }
  }

  /** The packing layout over whitespace tokens, documents concatenated
    * in ascending `idCol` order. Columns: `seq_id` (0-based sequence
    * number), `doc_id`, `tok_start` (slice start within the document),
    * `seq_off` (slice start within the sequence), `n_toks`.
    */
  def packLayout(docs: DataFrame, idCol: Column, textCol: Column,
                 seqTokens: Int): DataFrame = {
    require(seqTokens > 0, s"seqTokens ($seqTokens) must be positive")
    val spark = docs.sparkSession
    val counted = docs.select(idCol.as("doc_id"),
      size(filter(TextAnalysis.tokens(textCol), t => length(t) > 0))
        .cast("long").as("n_toks"))
    val ranged = Positional.ranged(counted, Seq(col("doc_id")),
      r => r.getLong(1))
    val idField = ranged.schema("doc_id")
    val n = seqTokens.toLong
    val out = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = ranged.offsets(pid)
      it.flatMap { r =>
        val docOff = off
        val toks = r.getLong(1)
        off += toks
        slices(docOff, toks, n).map { case (seq, tokStart, seqOff, len) =>
          Row(seq, r.get(0), tokStart, seqOff, len)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("seq_id", LongType, nullable = false),
      idField,
      StructField("tok_start", LongType, nullable = false),
      StructField("seq_off", LongType, nullable = false),
      StructField("n_toks", LongType, nullable = false))))
  }

  /** Per-sequence roll-up of a layout: document count, token fill, and
    * the id bounds — the shard-manifest view (`n_toks == seqTokens`
    * everywhere but the final partial sequence).
    */
  def sequenceStats(layout: DataFrame): DataFrame =
    layout.groupBy("seq_id").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_toks")).as("n_toks"),
      min(col("doc_id")).as("first_doc"),
      max(col("doc_id")).as("last_doc"))
}
