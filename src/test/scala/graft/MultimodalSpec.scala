package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  lazy val media = Multimodal.synthesizeMedia(docs)

  test("synthesized media: one row per doc, binary stays binary, header parses") {
    assert(media.count() == docs.count())
    val m = media.toDF()
      .withColumn("meta", media_meta(col("content")))
      .filter(col("meta").isNull)
    assert(m.count() == 0, "every packed payload must decode")
  }

  test("media_meta fields follow the deterministic header formulas") {
    val bad = media.toDF()
      .withColumn("meta", media_meta(col("content")))
      .filter(
        col("meta.width") =!= lit(64) + (col("doc_id") % 32).cast("int") * 16 ||
          col("meta.height") =!= lit(64) + (col("doc_id") % 24).cast("int") * 16 ||
          col("meta.kind") =!= col("kind"))
    assert(bad.count() == 0)
  }

  test("metadata predicate evaluates without touching payload (plan check)") {
    val q = media.toDF()
      .withColumn("meta", media_meta(col("content")))
      .filter(col("meta.width") > 512)
      .select("doc_id", "meta.width")
    assert(q.count() > 0)
    // width > 512 ⇔ doc_id % 32 >= 29 (64 + k*16 > 512 ⇔ k > 28)
    val wrong = q.filter(!(col("doc_id") % 32 >= 29)).count()
    assert(wrong == 0)
  }

  test("media_resize rewrites header dims and keeps payload bytes (visible stub)") {
    val r = media.toDF().limit(5)
      .withColumn("resized", media_resize(col("content"), 32, 32))
      .withColumn("m2", media_meta(col("resized")))
      .withColumn("m1", media_meta(col("content")))
    val rows = r.select("m2.width", "m2.height", "m1.payload_len", "m2.payload_len").collect()
    rows.foreach { row =>
      assert(row.getInt(0) == 32 && row.getInt(1) == 32)
      assert(row.getInt(2) == row.getInt(3)) // stub: payload untouched
    }
  }

  test("media_frames: videos explode into every-Nth frame slices") {
    val vids = media.toDF().filter(col("kind") === "video")
      .withColumn("meta", media_meta(col("content")))
      .withColumn("frames", media_frames(col("content"), 2))
    val bad = vids.filter(
      size(col("frames")) =!= ceil(col("meta.n_frames") / lit(2.0)).cast("int") &&
        col("meta.payload_len") >= col("meta.n_frames")) // slices need ≥1B/frame
    assert(bad.count() == 0, bad.select("doc_id", "meta.n_frames").take(3).mkString(","))
    // frames flatten into a (doc_id, frame) table without driver round-trips
    val flat = vids.select(col("doc_id"), explode(col("frames")).as("frame"))
    assert(flat.count() >= vids.count())
  }

  test("per-partition batch decode (mapInPandas shape) agrees with the expression path") {
    val viaPartitions = Multimodal.decodePartitions(media)
      .select("doc_id", "width", "height").as[(Long, Int, Int)].collect().toSet
    val viaExpr = media.toDF().withColumn("m", media_meta(col("content")))
      .select(col("doc_id"), col("m.width"), col("m.height"))
      .as[(Long, Int, Int)].collect().toSet
    assert(viaPartitions == viaExpr)
  }

  test("corrupt magic routes to dead-letter (null meta), not a crash") {
    val corrupt = Seq(Array[Byte](1, 2, 3), "JUNK1234".getBytes).toDF("content")
      .withColumn("meta", media_meta(col("content")))
    assert(corrupt.filter(col("meta").isNotNull).count() == 0)
  }

  // checked-in 4×3 RGB PNG: pixel (x,y) = (x·40, y·50, 128)
  private def pngBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/test_image.png")
    try in.readAllBytes() finally in.close()
  }

  test("REAL image decode: checked-in PNG pixels decode byte-exactly via javax.imageio") {
    val dec = new Multimodal.MediaDecoder
    val (w, h, feat) = dec.decode(pngBytes)
    assert(w == 4 && h == 3)
    // Σ(r+g+b) over pixels = Σ(x·40 + y·50 + 128) = 2856; mean = 2856/(4·3·3·255)
    assert(feat == 2856.0 / (4 * 3 * 3 * 255), s"feature=$feat")
    // the same path runs distributed through decodePartitions
    val rows = Multimodal.decodePartitions(
      Seq(Multimodal.MediaRow(7L, "image", pngBytes)).toDS()).collect()
    assert(rows.length == 1 &&
      rows(0) == Multimodal.DecodedRow(7L, "image", 4, 3, 2856.0 / 9180.0))
  }

  test("REAL image resize: nearest-neighbor resample, PNG round-trip") {
    val resized = Multimodal.resizeKernel(pngBytes, 2, 2)
    val dec = new Multimodal.MediaDecoder
    val (w, h, feat) = dec.decode(resized)
    assert(w == 2 && h == 2)
    // nearest-neighbor picks src pixels (0,0),(2,0),(0,1),(2,1):
    // Σ(r+g+b) = (0+0+128)+(80+0+128)+(0+50+128)+(80+50+128) = 772
    assert(feat == 772.0 / (2 * 2 * 3 * 255), s"feature=$feat")
    // and the distributed expression path agrees
    val viaExpr = Seq((1L, pngBytes)).toDF("doc_id", "content")
      .select(media_resize(col("content"), 2, 2).as("r"))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(viaExpr, resized))
  }

  test("undecodable payload dead-letters as (-1,-1,-1.0), never throws") {
    val rows = Multimodal.decodePartitions(
      Seq(Multimodal.MediaRow(9L, "image", Array[Byte](9, 9, 9, 9, 9))).toDS())
      .collect()
    assert(rows(0) == Multimodal.DecodedRow(9L, "image", -1, -1, -1.0))
  }
}
