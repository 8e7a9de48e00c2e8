package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic stub ([[Multimodal.decodeStub]]); the
  * Spark-side plumbing — binary column schema, typed `Dataset` encoders,
  * per-partition batched iteration (the JVM analogue of a
  * `mapInPandas`/Arrow-batch UDF), partitioning — is real and oracle-tested.
  *
  * Scale design: decode runs per partition with no shuffle at all; a real
  * deployment swaps `decodeStub` for a codec call and keys partitioning by
  * storage locality. Metadata extraction stays in codegen'd expressions
  * (`q_multimodal_meta`); only the opaque decode leaves codegen
  * (`q_media_decode`), mirroring preference order (b) before (d).
  */
object Multimodal {

  /** A media row: opaque payload + its id. The fixtures carry no binary
    * columns, so payloads are synthesized from `documents.text` (utf-8). */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Typed metadata a decoder would produce. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, content_md5: String,
                       fake_width: Int, fake_height: Int)

  /** STUB decoder — stands in for an image-header parse. Deterministic
    * function of the payload bytes only, so the DuckDB oracle can reproduce
    * it; a real deployment replaces this body with an actual codec. */
  private def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val hex = md.map(b => f"$b%02x").mkString
    MediaMeta(id, bytes.length, hex,
      bytes.length % 640 + 1, (bytes.length * 7) % 480 + 1)
  }

  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRecord] =
    Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as(Encoders.product[MediaRecord])

  /** Batched per-partition decode — the `mapPartitions` path (one decoder
    * instance per partition, streaming iteration, no per-row setup cost). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] =
    media.mapPartitions { it =>
      // per-partition setup would go here (codec handles, model weights…)
      it.map(r => decodeStub(r.doc_id, r.payload))
    }(Encoders.product[MediaMeta])

  /** Metadata extraction as pure codegen'd expressions (no decode). */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        md5(col("text")).as("content_md5"),
        (octet_length(col("text")) % 640 + 1).as("fake_width"),
        (octet_length(col("text")) * 7 % 480 + 1).as("fake_height"))
      .orderBy("doc_id")

  /** The same metadata via the opaque per-partition decode path. */
  def mediaDecode(s: SparkSession, d: String): DataFrame =
    decodeMeta(mediaFromDocuments(s, d)).toDF().orderBy("doc_id")

  /** Resize plan for a decoded medium: pure arithmetic on metadata (aspect
    * ratio preserved, longest side capped), so unlike the decode itself it
    * needs no stub — and is oracle-checkable end-to-end. */
  def resizePlan(meta: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("fake_width"), col("fake_height"))
    val scale = when(longest > maxSide,
      lit(maxSide).cast("double") / longest).otherwise(lit(1.0))
    meta.select(
      col("doc_id"), col("fake_width"), col("fake_height"),
      round(scale, 4).as("scale"),
      floor(col("fake_width") * scale).cast("int").as("out_w"),
      floor(col("fake_height") * scale).cast("int").as("out_h"))
  }

  def mediaResize(s: SparkSession, d: String): DataFrame =
    resizePlan(multimodalMeta(s, d), maxSide = 256).orderBy("doc_id")

  /** Feature vector extracted per payload — STUB: 8 doubles derived from
    * the md5 digest bytes (a real deployment runs an image/audio encoder
    * here). Demonstrates the batched feature-extraction shape: opaque bytes
    * in, fixed-dim vector out, one encoder instance per partition. */
  def extractFeatures(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val md = digest.digest(r.payload)
        (r.doc_id, md.take(8).map(b => (b & 0xff) / 255.0))
      }
    }.toDF("doc_id", "features")
  }

  /** One sampled "frame" record. */
  case class FrameMeta(doc_id: Long, frame_idx: Int, byte_offset: Int,
                       frame_md5: String)

  private val FrameBytes = 100
  private val MaxFrames = 8

  /** Frame sampling — the one-to-many decode shape (video → frames, audio →
    * windows): each payload yields up to 8 fixed-stride 100-byte "frames",
    * fingerprinted with the STUB hash in place of a real frame decode.
    * flatMap keeps it a single no-shuffle pass. */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[FrameMeta] =
    media.flatMap { r =>
      val nFrames = math.min(MaxFrames, math.max(1, r.payload.length / FrameBytes))
      (0 until nFrames).iterator.map { i =>
        val off = i * FrameBytes
        val end = math.min(off + FrameBytes, r.payload.length)
        val slice = java.util.Arrays.copyOfRange(r.payload, off, end)
        val md = java.security.MessageDigest.getInstance("MD5").digest(slice)
        FrameMeta(r.doc_id, i, off, md.map(b => f"$b%02x").mkString)
      }
    }(Encoders.product[FrameMeta])

  def frameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, d)).toDF().orderBy("doc_id", "frame_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_media_decode"    -> (mediaDecode _),
    "q_frame_sample"    -> (frameSample _),
    "q_media_resize"    -> (mediaResize _),
  )

  private val MetaSql =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS fake_width,
      |       CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS fake_height
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" -> MetaSql,
    "q_media_decode"    -> MetaSql,
    // ASCII fixture text ⇒ byte slicing == char slicing, so the frame md5s
    // are reproducible from substring in SQL
    "q_frame_sample" ->
      """SELECT doc_id,
        |       CAST(i AS INTEGER) AS frame_idx,
        |       CAST(i * 100 AS INTEGER) AS byte_offset,
        |       md5(substring(text, i * 100 + 1, 100)) AS frame_md5
        |FROM documents,
        |     unnest(range(least(8, greatest(1, octet_length(encode(text)) // 100)))) AS t(i)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS fake_width,
        |         CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS fake_height
        |  FROM documents
        |), sc AS (
        |  SELECT *,
        |         CASE WHEN greatest(fake_width, fake_height) > 256
        |              THEN CAST(256 AS DOUBLE) / greatest(fake_width, fake_height)
        |              ELSE 1.0 END AS raw_scale
        |  FROM m
        |)
        |SELECT doc_id, fake_width, fake_height,
        |       round(raw_scale, 4) AS scale,
        |       CAST(floor(fake_width * raw_scale) AS INTEGER) AS out_w,
        |       CAST(floor(fake_height * raw_scale) AS INTEGER) AS out_h
        |FROM sc
        |ORDER BY doc_id""".stripMargin,
  )
}
