package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.WinnowPositions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * the MOSS algorithm): hash every character k-gram, slide a window of
  * `w` consecutive hashes, select each window's minimum (rightmost on
  * ties), and keep the distinct selected positions. Guarantee: any
  * substring match of length ≥ `w + k − 1` between two documents shares
  * at least one selected fingerprint, with expected density `2/(w+1)` —
  * LOCAL fingerprinting, the complement of MinHash's global signature
  * (MinHash answers "are these documents similar?", winnowing answers
  * "do these documents share a passage, and where?").
  *
  * Scale shape: entirely map-side — shingle, hash, and a fused codegen
  * selection kernel ([[WinnowPositions]], one O(n·w) primitive loop per
  * document instead of per-element lambda dispatch); matching
  * fingerprints across documents is then ONE keyed shuffle on `fp`,
  * never a document pair scan.
  *
  * Hashing is xxhash64 by default; `portable = true` switches to the
  * repo's 4-byte md5 polynomial so an external engine can replay
  * fingerprints byte-for-byte (the [[Dedup.minhashCandidates]]
  * hashMode device).
  */
object Winnowing {

  /** The portable gram hash: the md5-prefix base-31 polynomial every
    * cross-engine gate in this repo uses (x17/x62 form, no modulus).
    */
  private[ext] def portableHash(gram: Column): Column = {
    val hex = md5(gram)
    (1 to 4).map(i =>
      ascii(substring(hex, i, 1)).cast("long")
        * lit(math.pow(31, 4 - i).toLong)).reduce(_ + _)
  }

  /** Per-document fingerprint rows `(doc_id, pos, fp)`: `pos` is the
    * 0-based k-gram offset selected by the winnow, `fp` the gram hash
    * at that offset.
    */
  def fingerprintTable(docs: DataFrame, idCol: Column, textCol: Column,
                       k: Int = 5, w: Int = 4,
                       portable: Boolean = false): DataFrame = {
    require(k > 0 && w > 0, s"k ($k) and w ($w) must be positive")
    // stage shingles as an attribute BEFORE hashing: lambda-bound
    // subtrees re-evaluate per element
    val shingled = docs
      .select(idCol.as("doc_id"), textCol.as("_text"))
      .filter(length(col("_text")) >= k)
      .select(col("doc_id"),
        TextAnalysis.charShingles(col("_text"), k).as("_sh"))
    val hashed = shingled.select(col("doc_id"),
      (if (portable) transform(col("_sh"), portableHash(_))
       else transform(col("_sh"), s => xxhash64(s))).as("_h"))
    hashed
      .select(col("doc_id"), col("_h"),
        WinnowPositions.of(col("_h"), w).as("_pos"))
      .select(col("doc_id"), explode(col("_pos")).as("pos"), col("_h"))
      .select(col("doc_id"), col("pos"),
        element_at(col("_h"), (col("pos") + 1).cast("int")).as("fp"))
  }

  /** Documents sharing ≥ `minShared` fingerprints, with the shared
    * count — the passage-overlap candidate pairs. One shuffle on `fp`;
    * a fingerprint shared by more than `maxPerFp` documents (ubiquitous
    * boilerplate) is dropped before pairing, the LSH `maxBucket` skew
    * device.
    */
  def sharedPassages(fps: DataFrame, minShared: Int = 2,
                     maxPerFp: Int = 64): DataFrame = {
    val byFp = fps.groupBy("fp")
      .agg(sort_array(collect_set(col("doc_id"))).as("_docs"))
      .filter(size(col("_docs")).between(2, maxPerFp))
    val pairs = byFp.select(col("fp"), explode(
      flatten(transform(col("_docs"), (a, i) =>
        transform(slice(col("_docs"), i + lit(2),
          greatest(size(col("_docs")) - i - 1, lit(0))),
          b => struct(a.as("a"), b.as("b")))))).as("_p"))
    pairs.groupBy(col("_p.a").as("doc_a"), col("_p.b").as("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
