package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]).
  *
  * - `bruteForceTopK` is the exactness baseline: broadcast the query
  *   vector, one codegen'd pass computing cosine, TakeOrdered for top-k.
  *   At 100 TB this is a full scan but zero shuffle (top-k is a
  *   treeReduce-style limit).
  * - `lshTopK` is the scale path: sign-random-projection buckets (an
  *   IVF/LSH hybrid): vectors land in 2^planes buckets keyed by the sign
  *   pattern against deterministic pseudo-random hyperplanes; the probe
  *   touches only the query's bucket (and optionally hamming-1 neighbors).
  *   Bucketing is a narrow map; the candidate set join is an equi-join on
  *   the bucket code.
  *
  * All arithmetic uses `zip_with`/`aggregate` higher-order functions —
  * codegen'd, no UDF.
  */
object SimilarityOps {

  /** Cosine similarity between an embedding column and a literal query
    * vector, computed in double precision, left-to-right sums.
    */
  def cosineToQuery(emb: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    val embD = transform(emb, x => x.cast("double"))
    val dot = aggregate(zip_with(embD, q, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(embD, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = math.sqrt(query.map(x => x * x).sum)
    dot / (na * lit(nb))
  }

  def bruteForceTopK(vectors: DataFrame, emb: Column, id: Column,
                     query: Seq[Double], k: Int): DataFrame =
    vectors.select(id.as("vec_id"), round(cosineToQuery(emb, query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a fixed hash mapped to [-1, 1). No RNG state → task-retry safe.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(concat(lit(s"plane$plane:"), dim.cast("string"))), lit(2000001L))
      .cast("double") / 1000000.0) - lit(1.0)

  /** Sign-random-projection bucket code over `planes` hyperplanes. */
  def srpCode(emb: Column, planes: Int): Column = {
    val embD = transform(emb, x => x.cast("double"))
    val bits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(embD, sequence(lit(0), size(emb) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: probe only vectors sharing the query's SRP bucket,
    * then exact cosine within the bucket. Recall/latency knob = planes.
    */
  def lshTopK(vectors: DataFrame, emb: Column, id: Column,
              query: Seq[Double], k: Int, planes: Int = 8): DataFrame = {
    val coded = vectors.select(id.as("vec_id"), emb.as("emb"),
      srpCode(emb, planes).as("bucket"))
    // query bucket computed the same way, driver-side
    val queryBits = (0 until planes).map { p =>
      val dot = query.zipWithIndex.map { case (x, i) =>
        // must mirror planeComponent exactly; xxhash64 of the same string
        x * planeComponentValue(p, i)
      }.sum
      if (dot >= 0) 1L << p else 0L
    }
    val queryBucket = queryBits.reduce(_ | _)
    coded.filter(col("bucket") === queryBucket)
      .select(col("vec_id"), round(cosineToQuery(col("emb"), query), 4).as("cosine"),
        col("bucket"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Driver-side mirror of planeComponent — same xxhash64 (Spark's
    * XxHash64 with seed 42) over the same UTF-8 string.
    */
  private def planeComponentValue(plane: Int, dim: Int): Double = {
    val bytes = s"plane$plane:$dim".getBytes("UTF-8")
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
    val mod = 2000001L
    val r = h % mod
    val pm = if (r < 0) r + mod else r
    pm.toDouble / 1000000.0 - 1.0
  }
}
