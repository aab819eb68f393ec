package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary` columns
  * with typed metadata, and batch feature extraction.
  *
  * Two decode tiers:
  *  - IMAGE decode is REAL: [[imageTable]] synthesizes genuine PNG bytes
  *    (deterministic pixels, dimensions derived from the media id) and
  *    [[decodeImages]] reads them back through `javax.imageio` —
  *    width/height/band-count come from the actual PNG headers, no
  *    external libraries needed. The DuckDB oracle asserts the decoded
  *    dimensions against the generator's formula, so a decode that
  *    dropped/flipped/padded dimensions fails the gate.
  *  - deep FEATURE extraction (embeddings) remains an honestly-labeled
  *    deterministic stub ([[decodeStub]]) — no ML runtime in this
  *    environment. The stub boundary is the function: swap in a real
  *    extractor (JNI/ONNX binding) without touching the plumbing.
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

  // ------------------------------------------------- real image decode

  final case class ImageRow(mediaId: Long, payload: Array[Byte])
  final case class DecodedImage(mediaId: Long, width: Int, height: Int, channels: Int)

  /** Image dimensions for a media id — the generator formula the oracle
    * replays: tiny images (≤ 71×55) so a 10^12-row corpus synthesizes in
    * scan time.
    */
  def imageWidth(mediaId: Long): Int = (mediaId % 64).toInt + 8
  def imageHeight(mediaId: Long): Int = (mediaId % 48).toInt + 8

  /** A REAL encoded PNG: deterministic RGB pixel ramp keyed by `seed`,
    * encoded through `javax.imageio`. Same JDK → byte-identical output;
    * any JDK → decodes back to exactly (w, h, 3 bands).
    */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = (x * 31 + y * 17 + seed) & 0xff
        val g = (x * 13 + y * 7 + seed * 3) & 0xff
        val b = (x * 5 + y * 29 + seed * 7) & 0xff
        img.setRGB(x, y, ((r << 16) | (g << 8) | b).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, "png", out))
      throw new IllegalStateException("JDK PNG writer unavailable")
    out.toByteArray
  }

  /** Deterministic real-PNG corpus: one image row per document with
    * `doc_id % 3 == 0` (the `mediaTable` image stratum), payload = an
    * actual PNG whose dimensions follow [[imageWidth]]/[[imageHeight]].
    * Generation happens executor-side in `mapPartitions` — the driver
    * never holds the images.
    */
  def imageTable(spark: SparkSession, sfDir: String): Dataset[ImageRow] = {
    import spark.implicits._
    // fan the ID LIST out to every core BEFORE synthesis: the id
    // projection of a small parquet is one split, which would serialize
    // the codec work (real PNG encode) on one task — the repartition
    // shuffles 8-byte ids, not payloads, and is derived from the
    // session's parallelism, not a tuned constant (guide §2.5/§6: fan
    // out cheap keys, generate heavy bytes in place)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions(_.map(id =>
        ImageRow(id, pngBytes(imageWidth(id), imageHeight(id), seed = id))))
  }

  /** REAL image decode: parse the PNG with `javax.imageio` and report
    * header truth — width, height, raster band count. Raises on an
    * undecodable payload (a corrupt image must be a visible error, not a
    * silent -1 row; quarantine upstream if tolerance is wanted).
    */
  def decodeImage(payload: Array[Byte]): (Int, Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    if (img == null)
      throw new IllegalArgumentException(
        s"payload is not a decodable image (${payload.length} bytes)")
    (img.getWidth, img.getHeight, img.getRaster.getNumBands)
  }

  /** Batch image decode: narrow `mapPartitions`, no shuffle; the payload
    * column is consumed here and pruned from everything downstream.
    */
  def decodeImages(images: Dataset[ImageRow]): Dataset[DecodedImage] = {
    import images.sparkSession.implicits._
    images.mapPartitions(_.map { r =>
      val (w, h, c) = decodeImage(r.payload)
      DecodedImage(r.mediaId, w, h, c)
    })
  }

  // ------------------------------------------------- real audio decode

  final case class AudioRow(mediaId: Long, payload: Array[Byte])
  final case class DecodedAudio(mediaId: Long, sampleRateHz: Int, channels: Int,
                                bitsPerSample: Int, frames: Long, durationMicros: Long)

  /** Audio generator formulas (the oracle replays these): tiny PCM clips. */
  def audioSampleRate(mediaId: Long): Int = 8000 + (mediaId % 8).toInt * 1000
  def audioFrames(mediaId: Long): Int = (mediaId % 500).toInt + 100

  /** A REAL RIFF/WAVE file: 16-bit mono PCM, deterministic sample ramp
    * keyed by `seed`, encoded through `javax.sound.sampled`. Decodes back
    * in any WAV reader to exactly (sampleRate, 1 channel, 16 bits,
    * frames).
    */
  def wavBytes(sampleRate: Int, frames: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      val s = ((i * 131 + seed * 31) % 65536 - 32768).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic real-WAV corpus: one audio row per document with
    * `doc_id % 3 == 1` (the `mediaTable` audio stratum).
    */
  def audioTable(spark: SparkSession, sfDir: String): Dataset[AudioRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id")).as[Long]
      // no fan-out here, unlike imageTable: WAV synthesis is header+ramp
      // (no compression), and the id shuffle measurably cost more than
      // the single-split synthesis it parallelized (r6 A/B: 0.29 s →
      // 0.56 s with the repartition)
      .mapPartitions(_.map(id =>
        AudioRow(id, wavBytes(audioSampleRate(id), audioFrames(id), seed = id))))
  }

  /** REAL audio header decode via `javax.sound.sampled`: sample rate,
    * channel count, bit depth, frame count from the actual RIFF headers;
    * duration derived in integer micros (`frames * 10^6 / rate`) so the
    * value is bit-reproducible in any engine. Raises on undecodable
    * payloads (same contract as [[decodeImage]]).
    */
  def decodeAudio(payload: Array[Byte]): DecodedAudio = {
    val aff = try javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(payload))
    catch {
      case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          s"payload is not a decodable audio file (${payload.length} bytes)", e)
    }
    val fmt = aff.getFormat
    val frames = aff.getFrameLength.toLong
    DecodedAudio(-1L, fmt.getSampleRate.toInt, fmt.getChannels,
      fmt.getSampleSizeInBits, frames,
      frames * 1000000L / fmt.getSampleRate.toLong)
  }

  /** Batch audio decode: narrow `mapPartitions`, payload consumed here. */
  def decodeAudios(audio: Dataset[AudioRow]): Dataset[DecodedAudio] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(_.map(r => decodeAudio(r.payload).copy(mediaId = r.mediaId)))
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
