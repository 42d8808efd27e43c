package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MultimodalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("withMedia: binary column + typed metadata") {
    val m = Multimodal.withMedia(docs).select("doc_id", "media", "media_len", "media_sha256")
    val r = m.filter(col("doc_id") === 0).head
    val text = docs.filter(col("doc_id") === 0).select("text").head.getString(0)
    assert(r.getAs[Array[Byte]]("media").toSeq == text.getBytes("UTF-8").toSeq)
    assert(r.getAs[Long]("media_len") == text.getBytes("UTF-8").length.toLong)
    assert(r.getAs[String]("media_sha256").matches("[0-9a-f]{64}"))
  }

  test("decodeImageStub: mapPartitions batch decode, deterministic, schema fixed") {
    val decoded = Multimodal.decodeImageStub(spark, Multimodal.withMedia(docs.limit(50)))
    val rows = decoded.collect()
    assert(rows.length == 50)
    rows.foreach { d =>
      assert(d.width >= 64 && d.width < 64 + 512)
      assert(d.height >= 64 && d.height < 64 + 512)
      assert(d.features.length == 8)
      assert(d.byte_len > 0)
    }
    // deterministic across runs
    val again = Multimodal.decodeImageStub(spark, Multimodal.withMedia(docs.limit(50))).collect()
    assert(rows.map(r => (r.doc_id, r.width, r.height)).toSeq ==
      again.map(r => (r.doc_id, r.width, r.height)).toSeq)
  }

  test("resizeStub: aspect-preserving fit, never upscales, never zero") {
    val decoded = Multimodal.decodeImageStub(spark, Multimodal.withMedia(docs.limit(100)))
    val resized = Multimodal.resizeStub(spark, decoded, maxW = 128, maxH = 96).collect()
    assert(resized.length == 100)
    resized.foreach { r =>
      assert(r.out_width <= 128 && r.out_height <= 96)
      assert(r.out_width >= 1 && r.out_height >= 1)
      assert(r.out_width <= r.width && r.out_height <= r.height) // no upscale
      // aspect ratio preserved within rounding
      val inRatio = r.width.toDouble / r.height
      val outRatio = r.out_width.toDouble / r.out_height
      assert(math.abs(inRatio - outRatio) / inRatio < 0.05)
    }
  }

  test("frameSampleIndices: every k-th frame, empty for zero frames") {
    import spark.implicits._
    val got = Seq(10L, 0L).toDF("n")
      .select(Multimodal.frameSampleIndices(col("n"), 3).as("idx"))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(got == Seq(Seq(0L, 3L, 6L, 9L), Seq.empty))
  }

  test("perceptualHash: identical media collide, bits are exactly above-mean flags") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.9f, 0.1f, 0.1f, 0.1f)), // mean 0.3 -> only bit 0
      (2L, Array(0.9f, 0.1f, 0.1f, 0.1f)), // identical -> same hash
      (3L, Array(0.1f, 0.9f, 0.9f, 0.1f))) // bits 1,2
      .toDF("id", "features")
    val got = df.select(col("id"), Multimodal.perceptualHash(col("features"), dims = 4))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 6L)
    // A uniform vector has no above-mean bit: hash 0, not an error.
    val flat = Seq(Tuple1(Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("features")
      .select(Multimodal.perceptualHash(col("features"), dims = 4)).head.getLong(0)
    assert(flat == 0L)
  }
}
