package graft.ext

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One decoded media record (decode itself is STUBBED — see [[MediaDecode]]). */
final case class MediaMeta(
    doc_id: Long, byte_len: Long, magic_hex: String,
    width: Int, height: Int, n_frames: Int)

/** Multimodal-column plumbing (SURVEY.md §2.9, builder-prompt multimodal
  * requirement): media as opaque `binary` columns + typed metadata.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * [[MediaDecode.decodeStub]] derives fake-but-deterministic dimensions from
  * byte length. Everything around it is real Spark plumbing: binary column
  * handling, batched per-partition decode via mapPartitions on a typed
  * Dataset (the Scala analogue of mapInPandas batches), stride-based frame
  * sampling, and metadata extraction with codegen'd built-ins.
  *
  * The `documents.text` bytes stand in for media payloads since the test
  * data has no binary table; at scale the binary column comes straight from
  * parquet BYTE_ARRAY with the same plan shape.
  */
object MediaDecode {
  /** STUB for unknown formats: a full implementation would invoke a codec
    * here. Deterministic fake: dimensions derived from byte length — this
    * is what the synthetic test corpus (text bytes) hits, and what the SQL
    * oracle mirrors. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (64 + n % 640, 48 + (n * 7) % 480, 1 + n % 24)
  }

  /** REAL pure-JVM container-header parse — no codec needed, dimensions
    * live at fixed offsets: PNG IHDR (big-endian u32 at 16/20), BMP
    * BITMAPINFOHEADER (little-endian i32 at 18/22; height may be negative
    * for top-down rows), GIF logical screen (little-endian u16 at 6/8).
    * None for anything else. */
  def decodeHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = bytes(i) & 0xff
    def be32(i: Int) = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    val pngMagic = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    // Dimensions must be strictly positive; a corrupt header (negative or
    // zero, or a PNG u32 overflowing Int) falls through to the next tier.
    def ok(w: Int, h: Int, f: Int): Option[(Int, Int, Int)] =
      if (w > 0 && h > 0) Some((w, h, f)) else None
    if (bytes.length >= 24 && bytes.startsWith(pngMagic))
      ok(be32(16), be32(20), 1)
    else if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M') {
      // Only trust offsets 18/22 for BITMAPINFOHEADER-or-later (DIB header
      // size >= 40); a legacy 12-byte BITMAPCOREHEADER stores u16 dims at
      // 18/20 instead.
      val dib = le32(14)
      if (dib >= 40) ok(le32(18), math.abs(le32(22)), 1)
      else if (dib == 12) ok(le16(18), le16(20), 1)
      else None
    } else if (bytes.length >= 10 &&
        (bytes.startsWith("GIF87a".getBytes("US-ASCII")) ||
          bytes.startsWith("GIF89a".getBytes("US-ASCII")))) {
      // frame count = number of image-separator blocks is a full-file walk;
      // header-level contract reports the logical screen + 1 frame
      ok(le16(6), le16(8), 1)
    } else None
  }

  /** JDK ImageIO dimension read — header-only, NOT a pixel decode: the
    * format reader's `getWidth/getHeight` parse just the container
    * metadata (for JPEG, the SOF segment), so a large payload costs
    * header bytes, not a full raster allocation. Disk caching is off
    * (`setUseCache(false)` in the static init) so nothing ever spools to
    * tmp in the executor hot path. Used when the fixed-offset header
    * parse doesn't recognize the container but ImageIO does (e.g. JPEG,
    * whose dimensions sit behind variable-length segments). Returns None
    * for non-image bytes. */
  def decodeImageIO(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis, true, true)
            val w = r.getWidth(0)
            val h = r.getHeight(0)
            if (w > 0 && h > 0) Some((w, h, 1)) else None
          } finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  // one-time JVM-wide init: never spool ImageInputStreams to disk
  javax.imageio.ImageIO.setUseCache(false)

  /** Decode tiers: fixed-offset header parse (cheap, no pixel work) →
    * ImageIO full decode (real formats the header parse can't size, e.g.
    * JPEG) → deterministic stub for non-image payloads (what the synthetic
    * text-bytes corpus hits). */
  def decode(bytes: Array[Byte]): (Int, Int, Int) =
    decodeHeader(bytes)
      .orElse(decodeImageIO(bytes))
      .getOrElse(decodeStub(bytes))

  /** Batched per-partition decode: one "decoder init" per partition (the
    * expensive part for real codecs), then record-at-a-time decode — the
    * shape a vectorized decode batch would take. */
  def decodePartitioned(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder initialization would go here
      it.map { case (id, bytes) =>
        val (w, h, f) = decode(bytes)
        val magic = bytes.take(4).map(b => f"${b & 0xff}%02x").mkString
        MediaMeta(id, bytes.length.toLong, magic, w, h, f)
      }
    }
  }
}

object MultimodalQueries {

  /** Media records with binary payload + extracted metadata, all with
    * codegen'd built-ins (the oracle-checkable subset of the plumbing —
    * the mapPartitions path is exercised in the test suite). */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bin = $"text".cast(BinaryType)
    val hexAll = hex(bin) // uppercase A-F in both Spark and DuckDB
    val byteLen = octet_length($"text").cast(LongType)
    Tables.documents(s, dir)
      .filter($"doc_id" < 200)
      .select(
        $"doc_id",
        byteLen.as("byte_len"),
        substring(hexAll, 1, 8).as("magic_hex"),
        // STUB decode metadata — deterministic fake, see MediaDecode
        (lit(64) + byteLen % 640).as("width"),
        (lit(48) + (byteLen * 7) % 480).as("height"),
        (lit(1) + byteLen % 24).as("n_frames"),
        // stride frame-sample: first byte of each quarter of the payload
        concat_ws("|",
          substring(hexAll, 1, 2),
          hexAll.substr(((byteLen / 4).cast(LongType) * 2 + 1).cast(IntegerType), lit(2)),
          hexAll.substr(((byteLen / 2).cast(LongType) * 2 + 1).cast(IntegerType), lit(2)),
          hexAll.substr(((byteLen * 3 / 4).cast(LongType) * 2 + 1).cast(IntegerType), lit(2)))
          .as("frame_sample"))
      .orderBy($"doc_id")
  }

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
      |  substring(hex(CAST(text AS BLOB)), 1, 8) AS magic_hex,
      |  64 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 640 AS width,
      |  48 + (CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 7) % 480 AS height,
      |  1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 24 AS n_frames,
      |  substring(hex(CAST(text AS BLOB)), 1, 2)
      |    || '|' || substring(hex(CAST(text AS BLOB)),
      |         CAST(octet_length(CAST(text AS BLOB)) // 4 * 2 + 1 AS INTEGER), 2)
      |    || '|' || substring(hex(CAST(text AS BLOB)),
      |         CAST(octet_length(CAST(text AS BLOB)) // 2 * 2 + 1 AS INTEGER), 2)
      |    || '|' || substring(hex(CAST(text AS BLOB)),
      |         CAST(octet_length(CAST(text AS BLOB)) * 3 // 4 * 2 + 1 AS INTEGER), 2)
      |    AS frame_sample
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin

  /** Byte-level feature extraction over the binary payload: a 16-bin
    * histogram of high nibbles (a real computation standing in for e.g. a
    * color histogram) and a stride-downsampled byte signature (the "resize"
    * shape: fixed-size output regardless of payload size). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hexChars = Seq("0", "1", "2", "3", "4", "5", "6", "7",
      "8", "9", "A", "B", "C", "D", "E", "F")
    Tables.documents(s, dir)
      .filter($"doc_id" < 200)
      .withColumn("hx", hex($"text".cast(BinaryType)))
      // high nibble of each byte = every odd hex char: collapse each hex
      // pair to its first char ONCE, then count each nibble value with
      // native length/replace — all codegen'd string ops. (The previous
      // form built a per-byte array and ran 16 interpreted HOF filters
      // over it: ~50k interpreted lambda calls per KB of payload.)
      .withColumn("nibs", regexp_replace($"hx", "(.).", "$1"))
      .select(
        $"doc_id",
        concat_ws(",", hexChars.map(c =>
          (length($"nibs") - length(replace($"nibs", lit(c), lit(""))))
            .cast("int")): _*).as("nib_hist"),
        expr("concat_ws('', transform(sequence(0, 15), k -> substring(hx, k*16+1, 2)))")
          .as("stride_sig"))
      .orderBy($"doc_id")
  }

  val mediaFeaturesSql: String =
    """WITH h AS (
      |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx
      |  FROM documents WHERE doc_id < 200),
      |n AS (
      |  SELECT doc_id, hx,
      |    list_transform(generate_series(1, length(hx) // 2),
      |      i -> substring(hx, i*2-1, 1)) AS nibs
      |  FROM h)
      |SELECT doc_id,
      |  array_to_string(list_transform(
      |    string_split('0,1,2,3,4,5,6,7,8,9,A,B,C,D,E,F', ','),
      |    c -> len(list_filter(nibs, x -> x = c))), ',') AS nib_hist,
      |  array_to_string(list_transform(generate_series(0, 15),
      |    k -> substring(hx, k*16+1, 2)), '') AS stride_sig
      |FROM n ORDER BY doc_id""".stripMargin

  /** X-multimodal dedup: perceptual GRADIENT hash (the dHash family) over
    * the binary payload — bit i is set when stride-sampled byte i exceeds
    * byte i+1, so the 15-bit hash captures the payload's coarse "shape"
    * and survives small edits (the property content hashes lack and
    * near-dup detection needs). Bytes come from the same 16-position
    * stride sample as the resize signature; byte values decode from hex
    * pairs through the instr/strpos alphabet polynomial (exact integers,
    * engine-identical). Output is the 16-band census with per-band
    * distinct-hash counts — collisions (n_docs > n_hashes) are the
    * near-dup candidates at corpus scale. Payloads under 128 bytes are
    * excluded (every stride position must exist: Spark's instr('', …)
    * and DuckDB's strpos diverge on empty needles).
    *
    * Scale: fully narrow per-row arithmetic + one 16-group aggregate —
    * the same zero-shuffle shape as the simhash tier. */
  def mediaPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .filter($"doc_id" < 200 &&
        octet_length($"text".cast(BinaryType)) >= 128)
      .withColumn("hx", hex($"text".cast(BinaryType)))
      .withColumn("vals", expr(
        "transform(sequence(0, 15), k -> " +
          "(instr('0123456789ABCDEF', substring(hx, k*16+1, 1)) - 1) * 16 + " +
          "(instr('0123456789ABCDEF', substring(hx, k*16+2, 1)) - 1))"))
      .withColumn("phash", expr(
        "aggregate(sequence(0, 14), 0L, (acc, i) -> acc + " +
          "IF(element_at(vals, i+1) > element_at(vals, i+2), " +
          "shiftleft(cast(1 as bigint), i), 0L))"))
      .groupBy(expr("phash div 2048").as("band"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"phash").as("n_hashes"))
      .orderBy($"band")
  }

  val mediaPhashSql: String =
    """WITH h AS (
      |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx
      |  FROM documents
      |  WHERE doc_id < 200 AND octet_length(CAST(text AS BLOB)) >= 128),
      |v AS (
      |  SELECT doc_id, list_transform(range(0, 16), k ->
      |    (strpos('0123456789ABCDEF', substring(hx, k*16+1, 1)) - 1) * 16
      |    + (strpos('0123456789ABCDEF', substring(hx, k*16+2, 1)) - 1)) AS vals
      |  FROM h),
      |p AS (
      |  SELECT doc_id, CAST(list_sum(list_transform(range(1, 16), i ->
      |    CASE WHEN vals[i] > vals[i+1]
      |         THEN (CAST(1 AS BIGINT) << (i-1)) ELSE 0 END)) AS BIGINT)
      |    AS phash
      |  FROM v)
      |SELECT phash // 2048 AS band, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT phash) AS BIGINT) AS n_hashes
      |FROM p GROUP BY 1 ORDER BY band""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_multimodal_phash", mediaPhash, Some(mediaPhashSql),
      "X-multimodal perceptual gradient-hash (dHash) banding census"),
    QueryDef("q_multimodal_meta", mediaMeta, Some(mediaMetaSql),
      "binary media column + metadata/frame-sample plumbing (decode stubbed)"),
    QueryDef("q_multimodal_features", mediaFeatures, Some(mediaFeaturesSql),
      "byte-level feature extraction: nibble histogram + stride signature"))
}
