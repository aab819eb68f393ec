package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design:
  * - exact dedup is a hash aggregate on sha256(text) — map-side partial
  *   aggregation, one shuffle keyed by digest (uniform by construction,
  *   no skew);
  * - MinHash+LSH follows the shingle→signature→band→bucket-join shape: a
  *   document explodes into `bands` rows (constant factor), candidates
  *   come from equi-joining on (band, bandHash) — at 100 TB this is the
  *   only dedup family whose cost stays near-linear, and the band hash
  *   key is uniform so the shuffle doesn't skew;
  * - SimHash gives a 64-bit signature whose hamming distance approximates
  *   cosine similarity of the bag of words; bucketing on the top bytes
  *   yields cheap near-dup candidates;
  * - exact n-gram Jaccard is reserved for candidate *verification*, never
  *   run all-pairs.
  */
object DedupOps {

  /** Exact duplicate groups: sha256 over raw text. */
  def exactGroups(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.groupBy(sha2(text, 256).as("text_sha256"))
      .agg(count(lit(1)).as("n_docs"), min(id).as("keep_doc_id"))

  // MinHash universe: affine rehash family (a*h + b) mod P over a single
  // per-shingle base hash. One xxhash64 per shingle total, then k cheap
  // long multiply/mods — ~30× cheaper than k seeded string hashes, and
  // overflow-free under ANSI mode (operands < 2^31, products < 2^62).
  private val MersenneP = 2147483647L // 2^31 - 1
  private def affineA(i: Int): Long = 1103515245L % MersenneP * (2 * i + 1) % MersenneP
  private def affineB(i: Int): Long = (12345L + 2654435761L * i) % MersenneP

  /** Per-shingle base hashes (one xxhash64 per shingle). */
  def shingleBaseHashes(text: Column, n: Int = 3): Column =
    transform(TextOps.shingles(text, n), s => pmod(xxhash64(s), lit(MersenneP)))

  /** MinHash signature over a precomputed base-hash array column. */
  def minhashSignatureFromHashes(baseHashes: Column, k: Int = 32): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      when(size(baseHashes) > 0,
        array_min(transform(baseHashes, h =>
          pmod(h * element_at(array((0 until k).map(j => lit(affineA(j))): _*), i + 1)
            + element_at(array((0 until k).map(j => lit(affineB(j))): _*), i + 1), lit(MersenneP)))))
        .otherwise(lit(Long.MaxValue)))

  def minhashSignature(text: Column, n: Int = 3, k: Int = 32): Column =
    minhashSignatureFromHashes(shingleBaseHashes(text, n), k)

  /** LSH band rows: one row per (doc, band) with the band's hash — join
    * candidates share (band, bandHash). Base hashes and the signature are
    * materialized as columns so each is computed once per row.
    */
  def lshBands(docs: DataFrame, text: Column, id: Column,
               n: Int = 3, k: Int = 32, bands: Int = 8): DataFrame = {
    val rowsPerBand = k / bands
    docs.select(id.as("doc_id"), shingleBaseHashes(text, n).as("bh"))
      .select(col("doc_id"), minhashSignatureFromHashes(col("bh"), k).as("sig"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(concat_ws(",",
            transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string"))))))
        .as(Seq("band", "band_hash")))
  }

  /** Candidate near-duplicate pairs from LSH buckets, verified with exact
    * word-shingle Jaccard ≥ `threshold`. The verification join touches
    * only candidate ids — never all pairs.
    */
  def minhashNearDuplicates(docs: DataFrame, text: Column, id: Column,
                            n: Int = 3, k: Int = 32, bands: Int = 8,
                            threshold: Double = 0.5): DataFrame = {
    // materialize band rows once: both sides of the self-join read the
    // cached copy instead of recomputing signatures
    val b = lshBands(docs, text, id, n, k, bands).cache()
    val pairs = b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") &&
        col("l.band_hash") === col("r.band_hash") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    val shingleSets = docs.select(id.as("doc_id"),
      array_distinct(TextOps.shingles(text, n)).as("sh"))
    pairs
      .join(shingleSets.withColumnsRenamed(Map("doc_id" -> "doc_a", "sh" -> "sh_a")), "doc_a")
      .join(shingleSets.withColumnsRenamed(Map("doc_id" -> "doc_b", "sh" -> "sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))).cast("double"), lit(1.0)))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over the word multiset: bit b of the result is the
    * sign of the sum over words of ±1 taken from bit b of xxhash64(word).
    */
  def simhash64(text: Column): Column = {
    val w = TextOps.words(text)
    val sums = aggregate(
      w,
      transform(sequence(lit(0), lit(63)), _ => lit(0L)),
      (acc, word) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("shiftright", xxhash64(word), b).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)),
        (a, v) => a + v))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(63)),
        (s, b) => when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup candidates: same top-48-bit prefix bucket. */
  def simhashBuckets(docs: DataFrame, text: Column, id: Column): DataFrame =
    docs.select(id.as("doc_id"), simhash64(text).as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), 16))

  /** Exact word-set Jaccard between each doc and its successor — a linear
    * verification-shaped query (oracle-friendly).
    */
  def neighborJaccard(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val sets = docs.select(id.as("doc_id"), TextOps.distinctWords(text).as("ws"))
    sets.as("a").join(sets.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_id"),
        round(size(array_intersect(col("a.ws"), col("b.ws"))).cast("double") /
          greatest(size(array_union(col("a.ws"), col("b.ws"))).cast("double"), lit(1.0)), 4)
          .as("jaccard_next"))
  }
}
