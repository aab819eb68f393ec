package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, and batch feature extraction.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning) is real and
  * tested; the actual media decode is STUBBED with a deterministic fake —
  * image/audio codec libraries are not available in this environment. The
  * stub boundary is `decodeStub`: swap in a real decoder (e.g. a JNI
  * binding or `mapInPandas` on PySpark) without touching the plumbing.
  *
  * Scale notes: payload bytes ride in the row (Parquet binary), feature
  * extraction is a narrow `mapPartitions` batch — no shuffle; downstream
  * joins happen on the compact (id, features) projection, never on the
  * payload column (column pruning drops the bytes).
  */
object MultimodalOps {

  final case class MediaRow(
      mediaId: Long,
      kind: String,          // "image" | "audio" | "video"
      mimeType: String,
      payload: Array[Byte],  // opaque encoded media
      width: Int,            // -1 when unknown/not applicable
      height: Int,
      durationMs: Long)

  final case class MediaFeatures(
      mediaId: Long,
      kind: String,
      nBytes: Long,
      features: Array[Float]) // fixed 8-dim stub embedding

  /** Build a deterministic media table from the documents table: payload =
    * UTF-8 bytes of the text (stands in for encoded media), metadata derived
    * from row values. The schema is the real contract.
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      lit("application/octet-stream").as("mimeType"),
      encode(col("text"), "UTF-8").as("payload"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(640)) + 32).cast("int"))
        .otherwise(-1).as("width"),
      when(pmod(col("doc_id"), lit(3)) === 0, (pmod(col("doc_id"), lit(480)) + 32).cast("int"))
        .otherwise(-1).as("height"),
      when(pmod(col("doc_id"), lit(3)) =!= 0, pmod(col("doc_id"), lit(60000L))).otherwise(-1L)
        .as("durationMs")
    ).as[MediaRow]
  }

  /** STUB decode: a real implementation would decode the payload
    * (image decode / audio resample / video frame-sample) and run a
    * feature extractor. This deterministic fake derives 8 floats from
    * salted portable hashes of the payload bytes ([[PortableHash.h60]]),
    * so tests have stable expectations AND the DuckDB oracle can verify
    * the exact feature values end-to-end through the batch plumbing.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < 8) {
      val salted = payload ++ s":f$i".getBytes("UTF-8")
      out(i) = ((PortableHash.h60(salted) % 1000003L).toDouble / 1000003.0).toFloat
      i += 1
    }
    out
  }

  /** Batch feature extraction: one partition = one batch; the stub is the
    * per-batch decode hook.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        MediaFeatures(m.mediaId, m.kind, m.payload.length.toLong, decodeStub(m.payload))
      }
    }
  }

  /** Queryable summary: per media kind — row count, total payload bytes,
    * and the quantized sum of the first stub feature. The feature is
    * quantized to an integer (floor of f0·10^6) BEFORE summing so the
    * aggregate is order-independent and exactly reproducible in the
    * oracle (floating-point sums are partition-order dependent).
    */
  def featureSummary(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .select(col("kind"), col("nBytes"),
        floor(element_at(col("features"), 1).cast("double") * 1000000.0).cast("long").as("f0q"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("nBytes")).as("total_bytes"),
        sum(col("f0q")).as("f0_micro_sum"))
}
