package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * resize / frame-sampling stages.
  *
  * The actual codec is NOT available in this environment, so `decode` is
  * a clearly-marked deterministic stub (metadata derived from a content
  * hash). Everything around it — schema shape, columnar batch flow,
  * partitioning, explode of sampled frames — is real Spark and is what
  * matters at 100 TB: payloads stay in executors, never on the driver;
  * per-row work is codegen'd; frame explosion is a lateral view, not a
  * driver loop.
  *
  * Two decode paths: [[decode]] is the columnar stub (codegen-friendly,
  * used by the oracle queries), and [[decodeBatched]] is the REAL
  * `mapPartitions` integration point — one codec context per partition,
  * actual PNG / RIFF-WAVE header parsing from payload bytes, stub
  * fallback for unrecognized containers so the two paths agree on the
  * synthetic corpus. A production build swaps the header parsers for a
  * native (JNI/FFI) codec behind the same per-partition context.
  */
object Multimodal {

  /** 28-bit deterministic int from any column (content-hash based). */
  private def h28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** Build an asset table from the documents fixture: the text bytes
    * stand in for an encoded media payload.
    */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")
        .as("media_type")
    )

  /** STUB decode: deterministic fake metadata from the payload hash.
    * A real implementation decodes the container header here.
    */
  def fakeDecode(payload: Column): Column = {
    val h = md5(payload)
    struct(
      (lit(16) + h28(concat(h, lit("w"))) % 1024).cast("int").as("width"),
      (lit(16) + h28(concat(h, lit("h"))) % 1024).cast("int").as("height"),
      (lit(1) + h28(concat(h, lit("f"))) % 240).cast("int").as("n_frames"),
      length(payload).as("byte_len"),
      h.as("content_md5")
    )
  }

  /** Decode stage: payload → metadata struct columns. */
  def decode(assets: DataFrame): DataFrame =
    assets
      .withColumn("meta", fakeDecode(col("payload")))
      .select(
        col("asset_id"),
        col("media_type"),
        col("payload"),
        col("meta.width"),
        col("meta.height"),
        col("meta.n_frames"),
        col("meta.byte_len"),
        col("meta.content_md5")
      )

  /** One decoded row — the `mapPartitions` output record. For audio,
    * `width`/`height` carry channels/bits-per-sample and `n_frames` is
    * sample frames (the audio meaning of "frame").
    */
  final case class DecodedAsset(
      asset_id: Long,
      media_type: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int,
      byte_len: Int,
      content_md5: String
  )

  /** The per-partition "codec context": real container-header parsers
    * (PNG IHDR, RIFF/WAVE fmt+data) plus a reused digest instance —
    * the stand-in for the native handle a JNI/FFI codec would open once
    * per partition. Payloads that are not a recognized container fall
    * back to the deterministic stub, bit-identical to [[fakeDecode]].
    */
  private final class CodecContext {
    private val md = java.security.MessageDigest.getInstance("MD5")

    private def md5Hex(b: Array[Byte]): String = {
      md.reset()
      md.digest(b).map("%02x".format(_)).mkString
    }
    private def h28(s: String): Long =
      java.lang.Long.parseLong(md5Hex(s.getBytes("UTF-8")).take(7), 16)

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def le32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], o: Int, t: String): Boolean =
      b.length >= o + 4 && t.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => b(o + i) == c }

    /** PNG: 8-byte signature, then the IHDR chunk (len + "IHDR" +
      * width/height as big-endian u32). Still images: one frame.
      */
    private def parsePng(p: Array[Byte]): Option[(Int, Int, Int)] = {
      val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (p.length < 24 || !p.take(8).sameElements(sig) || !tag(p, 12, "IHDR")) None
      else Some((be32(p, 16).toInt, be32(p, 20).toInt, 1))
    }

    /** RIFF/WAVE: walk the chunk list for `fmt ` (channels, block align,
      * bits/sample) and `data` (payload size). Sample frames =
      * dataSize / blockAlign. Chunks are word-aligned (odd sizes pad).
      */
    private def parseWav(p: Array[Byte]): Option[(Int, Int, Int)] = {
      if (p.length < 12 || !tag(p, 0, "RIFF") || !tag(p, 8, "WAVE")) return None
      var o = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, blockAlign, bits)
      var dataSize: Option[Long] = None
      while (o + 8 <= p.length && (fmt.isEmpty || dataSize.isEmpty)) {
        val size = le32(p, o + 4)
        if (tag(p, o, "fmt ") && o + 8 + 16 <= p.length)
          fmt = Some((le16(p, o + 10), le16(p, o + 20), le16(p, o + 22)))
        else if (tag(p, o, "data")) dataSize = Some(size)
        o += 8 + size.toInt + (size.toInt & 1)
      }
      for {
        (channels, blockAlign, bits) <- fmt
        d <- dataSize
        if blockAlign > 0
      } yield (channels, bits, (d / blockAlign).toInt)
    }

    /** Stub fallback — value-identical to the columnar [[fakeDecode]]:
      * same md5-hex string concatenations, same 28-bit hash, same
      * modular ranges.
      */
    private def fake(p: Array[Byte]): (Int, Int, Int, String) = {
      val h = md5Hex(p)
      ((16 + h28(h + "w") % 1024).toInt, (16 + h28(h + "h") % 1024).toInt, (1 + h28(h + "f") % 240).toInt, h)
    }

    def decodeOne(id: Long, mediaType: String, p: Array[Byte]): DecodedAsset = {
      val parsed = parsePng(p).orElse(parseWav(p))
      val (w, hgt, nf, hash) = parsed match {
        case Some((a, b, f)) => (a, b, f, md5Hex(p))
        case None            => fake(p)
      }
      DecodedAsset(id, mediaType, p, w, hgt, nf, p.length, hash)
    }
  }

  /** Batched decode: the real `mapPartitions` path — one
    * [[CodecContext]] opened per PARTITION (not per row), rows streamed
    * through it. Recognized containers (PNG, RIFF/WAVE) are decoded
    * from their actual header bytes; anything else falls back to the
    * deterministic stub, so on a stub-only corpus this is
    * value-identical to the columnar [[decode]] (MultimodalSpec proves
    * both properties). Payloads never leave the executors; the
    * per-partition context is where a JNI/FFI codec handle would live.
    *
    * `ctxProbe` is a test hook invoked once per opened context.
    */
  def decodeBatched(assets: DataFrame, ctxProbe: () => Unit = () => ()): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col("asset_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        ctxProbe()
        val ctx = new CodecContext
        rows.map { case (id, mt, p) => ctx.decodeOne(id, mt, p) }
      }
      .toDF()
      .select(
        col("asset_id"),
        col("media_type"),
        col("payload"),
        col("width"),
        col("height"),
        col("n_frames"),
        col("byte_len"),
        col("content_md5")
      )
  }

  /** Fake feature extraction: a deterministic 4-dim embedding in [0,1)
    * from content-hash chunks (real impl: model inference per batch).
    */
  def features(decoded: DataFrame): DataFrame =
    decoded.withColumn(
      "feature",
      transform(
        sequence(lit(0), lit(3)),
        j => h28(concat(col("content_md5"), j.cast("string"))).cast("double") / lit(268435456.0)
      )
    )

  /** Resize stage: pure metadata transform (halve both dimensions,
    * floor at 1). A real impl maps payload batches through a scaler.
    */
  def resize(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("width", greatest(floor(col("width") / 2).cast("int"), lit(1)))
      .withColumn("height", greatest(floor(col("height") / 2).cast("int"), lit(1)))

  /** Frame sampling: every `step`-th frame index as exploded rows —
    * a lateral view, fully distributed.
    */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame =
    decoded
      .filter(col("media_type") === "video")
      .select(
        col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx")
      )
}
