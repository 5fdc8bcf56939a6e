package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The batched (mapPartitions) decode path: value-identical to the
  * columnar stub on the synthetic corpus, real header parsing for real
  * containers, and exactly one codec context per partition.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession
    .builder("graft-multimodal-test", "local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()

  private def assets = Multimodal.assetsFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  )

  private def metaRows(df: org.apache.spark.sql.DataFrame) =
    df.select("asset_id", "media_type", "width", "height", "n_frames", "byte_len", "content_md5")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getString(6)))
      .toSet

  test("decodeBatched equals the columnar decode on the synthetic corpus") {
    val columnar = metaRows(Multimodal.decode(assets))
    val batched = metaRows(Multimodal.decodeBatched(assets))
    assert(batched == columnar, "stub fallback must be bit-identical to fakeDecode")
    assert(columnar.nonEmpty)
  }

  test("one codec context per partition, not per row") {
    val opened = spark.sparkContext.longAccumulator("ctx-opened")
    val in = assets.repartition(3)
    val n = Multimodal.decodeBatched(in, ctxProbe = () => opened.add(1)).count()
    assert(n > 3, "fixture must have more rows than partitions")
    assert(opened.value == 3, s"expected 3 contexts for 3 partitions, got ${opened.value}")
  }

  private def png(width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(width).putInt(height)
    bb.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    bb.array()
  }

  private def wav(channels: Int, sampleRate: Int, bits: Int, dataBytes: Int): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
    bb.putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    bb.array()
  }

  test("real PNG and WAV headers decode from their actual bytes") {
    import spark.implicits._
    val rows = Seq(
      (1L, png(640, 360), "image"),
      (2L, wav(channels = 2, sampleRate = 44100, bits = 16, dataBytes = 400), "audio"),
      (3L, "not a container at all".getBytes("UTF-8"), "video")
    ).toDF("asset_id", "payload", "media_type")
    val got = Multimodal
      .decodeBatched(rows)
      .collect()
      .map(r => r.getAs[Long]("asset_id") -> ((r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"))))
      .toMap
    assert(got(1L) == ((640, 360, 1)), s"PNG IHDR mis-parsed: ${got(1L)}")
    // audio mapping: width=channels, height=bits/sample, n_frames=sample
    // frames = dataBytes / blockAlign = 400 / 4
    assert(got(2L) == ((2, 16, 100)), s"WAV fmt/data mis-parsed: ${got(2L)}")
    // unrecognized container falls back to the stub's hash ranges
    val (w, h, f) = got(3L)
    assert(w >= 16 && w < 16 + 1024 && h >= 16 && h < 16 + 1024 && f >= 1 && f <= 240)
  }
}
