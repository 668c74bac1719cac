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

  /** PCM16 mono WAV written by the JDK's OWN encoder (AudioSystem.write)
    * — an implementation independent of the hand-rolled wavPackKernel. */
  private def jdkWav(samples: Array[Short], rate: Float,
                     fileType: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    val big = fileType == javax.sound.sampled.AudioFileFormat.Type.AIFF
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, big)
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      val v = samples(i)
      if (big) { bytes(2 * i) = (v >> 8).toByte; bytes(2 * i + 1) = v.toByte }
      else { bytes(2 * i) = v.toByte; bytes(2 * i + 1) = (v >> 8).toByte }
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  test("REAL audio decode: a JDK-encoded WAV decodes byte-exactly") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 1000, -1000, 0)
    val wav = jdkWav(samples, 8000f, javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val r = Multimodal.audioMetaKernel(wav)
    assert(r != null)
    assert(r.getString(0) == "PCM_SIGNED")
    assert(r.getInt(1) == 8000 && r.getInt(2) == 1 && r.getInt(3) == 16)
    assert(r.getLong(4) == 8L && r.getLong(5) == 1L) // 8 frames @8kHz = 1 ms
    val sumAbs = samples.map(s => math.abs(s.toLong)).sum
    assert(r.getDouble(6) == sumAbs.toDouble / (8 * 32768.0))
    // PCM extraction returns the exact normalized samples in order
    val got = Multimodal.audioSamplesKernel(wav, 1 << 20)
    assert(got.toDoubleArray().toSeq == samples.map(_ / 32768.0).toSeq)
  }

  test("REAL audio decode: AIFF (big-endian) and truncation via maxSamples") {
    val samples = Array.tabulate[Short](100)(i => ((i * 517) % 30000).toShort)
    val aiff = jdkWav(samples, 16000f, javax.sound.sampled.AudioFileFormat.Type.AIFF)
    val r = Multimodal.audioMetaKernel(aiff)
    assert(r != null && r.getInt(1) == 16000 && r.getLong(4) == 100L)
    assert(r.getDouble(6) ==
      samples.map(s => math.abs(s.toLong)).sum.toDouble / (100 * 32768.0))
    val head = Multimodal.audioSamplesKernel(aiff, 10)
    assert(head.toDoubleArray().toSeq == samples.take(10).map(_ / 32768.0).toSeq)
  }

  test("wav_pack synthesis decodes through the real JDK parser, closed-form") {
    val wav = Multimodal.wavPackKernel(seed = 42L, sampleRate = 12000,
      channels = 2, frames = 60)
    val r = Multimodal.audioMetaKernel(wav)
    assert(r != null)
    assert(r.getString(0) == "PCM_SIGNED" && r.getInt(1) == 12000 &&
      r.getInt(2) == 2 && r.getInt(3) == 16 && r.getLong(4) == 60L &&
      r.getLong(5) == 5L)
    val expect = (0 until 120).map(j =>
      java.lang.Math.floorMod(42L * 31 + j.toLong * 7919, 65536L) - 32768L)
    assert(r.getDouble(6) == expect.map(math.abs).sum.toDouble / (120 * 32768.0))
    // the expression path agrees with the kernel path
    val viaExpr = Seq(1L).toDF("doc_id")
      .select(audio_meta(wav_pack(lit(42L), lit(12000), lit(2), lit(60))).as("a"))
      .select(col("a.sample_rate"), col("a.frames"), col("a.mean_abs"))
      .collect()(0)
    assert(viaExpr.getInt(0) == 12000 && viaExpr.getLong(1) == 60L &&
      viaExpr.getDouble(2) == r.getDouble(6))
  }

  test("REAL audio resample: exact-integer linear interpolation, identity at src rate") {
    // hand-computed upsample 2×: samples [0, 100] → positions 0, 0.5, 1 →
    // [0, (0+100)/2, 100] (exact: biased u = [32768, 32868], midpoint 32818)
    val up = jdkWav(Array[Short](0, 100), 8000f,
      javax.sound.sampled.AudioFileFormat.Type.WAVE)
    val got = Multimodal.audioResampleKernel(up, 16000, 1 << 20)
    assert(got.toDoubleArray().toSeq == Seq(0.0, 50 / 32768.0, 100 / 32768.0))
    // downsample 2×: every 2nd source frame, exactly (rem = 0 at all k)
    val down = jdkWav(Array[Short](0, 100, -100, 32767), 8000f,
      javax.sound.sampled.AudioFileFormat.Type.WAVE)
    assert(Multimodal.audioResampleKernel(down, 4000, 1 << 20)
      .toDoubleArray().toSeq == Seq(0.0, -100 / 32768.0))
    // identity: dst == src reproduces the decode bit-for-bit, channels kept
    val stereo = Multimodal.wavPackKernel(9L, 12000, 2, 40)
    assert(Multimodal.audioResampleKernel(stereo, 12000, 1 << 20)
      .toDoubleArray().toSeq ==
      Multimodal.audioSamplesKernel(stereo, 1 << 20).toDoubleArray().toSeq)
    // big-endian AIFF rides the same path
    val aiff = jdkWav(Array[Short](1000, 3000), 8000f,
      javax.sound.sampled.AudioFileFormat.Type.AIFF)
    assert(Multimodal.audioResampleKernel(aiff, 16000, 1 << 20)
      .toDoubleArray().toSeq ==
      Seq(1000 / 32768.0, 2000 / 32768.0, 3000 / 32768.0))
    // corrupt bytes dead-letter as null; maxFrames caps the row width
    assert(Multimodal.audioResampleKernel(Array[Byte](1, 2, 3), 16000, 10) == null)
    assert(Multimodal.audioResampleKernel(up, 16000, 2).numElements() == 2)
    // the expression path agrees with the kernel
    import graft.multimodal.functions.{audio_resample, wav_pack}
    val viaExpr = Seq(1L).toDF("doc_id")
      .select(audio_resample(wav_pack(lit(9L), lit(12000), lit(2), lit(40)), 12000).as("r"))
      .collect()(0).getSeq[Double](0)
    assert(viaExpr == Multimodal.audioSamplesKernel(stereo, 1 << 20).toDoubleArray().toSeq)
  }

  test("audio: corrupt or non-audio bytes return null meta, not a crash") {
    assert(Multimodal.audioMetaKernel(Array[Byte](1, 2, 3)) == null)
    assert(Multimodal.audioMetaKernel("RIFFxxxxWAVEfmt ".getBytes) == null)
    assert(Multimodal.audioSamplesKernel(pngBytes, 100) == null)
    // and through the expression (null column, no exception)
    val viaExpr = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "content")
      .select(audio_meta(col("content")).as("a")).collect()(0)
    assert(viaExpr.isNullAt(0))
  }

  /** JPEG-encode a solid-color image via the JDK's OWN encoder — an
    * implementation independent of the hand-rolled RIFF/AVI packer. */
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("REAL video decode: AVI/MJPEG container walk + per-frame javax.imageio") {
    import graft.multimodal.Avi
    val payloads = Array(
      jpegFrame(6, 4, 0x808080), jpegFrame(6, 4, 0x000000), jpegFrame(6, 4, 0xffffff))
    val avi = Avi.packFrames(width = 6, height = 4, fps = 10, payloads)
    val m = Avi.metaKernel(avi)
    assert(m != null)
    assert(m.getUTF8String(0).toString == "MJPG")
    assert(m.getInt(1) == 6 && m.getInt(2) == 4)
    assert(m.getInt(3) == 100000 && m.getInt(4) == 3 && m.getInt(5) == 3)
    assert(m.getLong(6) == payloads.map(_.length.toLong).sum)
    // frame extraction returns the exact JPEG payloads, in order
    val fr = Avi.framesKernel(avi, 1)
    assert(fr.numElements() == 3)
    payloads.indices.foreach { i =>
      assert(java.util.Arrays.equals(fr.getBinary(i), payloads(i)))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fr.getBinary(i)))
      assert(img.getWidth == 6 && img.getHeight == 4)
    }
    // MediaDecoder routes AVI to the video path: container dims + the mean
    // intensity of the REAL pixel decode of the representative frame
    val dec = new Multimodal.MediaDecoder
    val expectFeat = dec.meanIntensity(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payloads(0))))
    assert(dec.decode(avi) == ((6, 4, expectFeat)))
    assert(expectFeat > 0.4 && expectFeat < 0.6) // mid-gray survives JPEG loss
  }

  test("avi_pack closed-form synthesis parses through the real container walk") {
    import graft.multimodal.Avi
    val avi = Avi.packKernel(seed = 5L, width = 64, height = 48, fps = 15, frames = 4)
    val m = Avi.metaKernel(avi)
    assert(m != null && m.getUTF8String(0).toString == "MJPG")
    assert(m.getInt(1) == 64 && m.getInt(2) == 48 && m.getInt(3) == 66666)
    assert(m.getInt(4) == 4 && m.getInt(5) == 4)
    assert(m.getLong(6) == (0 until 4).map(Avi.frameLen(5L, _).toLong).sum)
    // every-2nd frame extraction: payload bytes match the closed form
    val fr = Avi.framesKernel(avi, 2)
    assert(fr.numElements() == 2)
    Seq(0, 2).zipWithIndex.foreach { case (f, k) =>
      val got = fr.getBinary(k)
      assert(got.length == Avi.frameLen(5L, f))
      got.indices.foreach(i => assert((got(i) & 0xff) == Avi.frameByte(5L, f, i)))
    }
    // and the distributed expression path agrees with the kernels
    val viaExpr = Seq(1L).toDF("doc_id")
      .select(video_meta(avi_pack(lit(5L), lit(64), lit(48), lit(15), lit(4))).as("v"),
        video_frames(avi_pack(lit(5L), lit(64), lit(48), lit(15), lit(4)), 2).as("fr"))
      .collect()(0)
    val v = viaExpr.getStruct(0)
    assert(v.getString(0) == "MJPG" && v.getInt(1) == 64 && v.getInt(4) == 4)
    val exprFrames = viaExpr.getSeq[Array[Byte]](1)
    assert(exprFrames.length == 2 &&
      java.util.Arrays.equals(exprFrames.head, fr.getBinary(0)))
  }

  test("rec-grouped interleaved AVI decodes identically to the flat layout") {
    import graft.multimodal.Avi
    val payloads = Array(
      jpegFrame(6, 4, 0x808080), jpegFrame(6, 4, 0x000000), jpegFrame(6, 4, 0xffffff))
    val flat = Avi.packFrames(6, 4, 10, payloads)
    val rec = Avi.packFrames(6, 4, 10, payloads, recGroup = true)
    val (mf, mr) = (Avi.metaKernel(flat), Avi.metaKernel(rec))
    assert(mr != null)
    // the movi census sees THROUGH the rec grouping: same chunks, same bytes
    assert(mr.getInt(5) == mf.getInt(5) && mr.getLong(6) == mf.getLong(6))
    val (ff, fr) = (Avi.framesKernel(flat, 1), Avi.framesKernel(rec, 1))
    assert(fr.numElements() == ff.numElements())
    payloads.indices.foreach(i =>
      assert(java.util.Arrays.equals(fr.getBinary(i), payloads(i))))
  }

  test("hostile GRFT n_frames header cannot spin or overflow media_frames") {
    val blob = Multimodal.pack(1L, 2, "hello world payload".getBytes)
    blob(24) = 0x7f.toByte; blob(25) = 0xff.toByte // n_frames = Int.MaxValue
    blob(26) = 0xff.toByte; blob(27) = 0xff.toByte
    val t0 = System.nanoTime()
    val fr = Multimodal.framesKernel(blob, 1)
    assert(System.nanoTime() - t0 < 2e9, "must be payload-bounded, not header-bounded")
    // at most one frame per payload byte; every slice is a real payload slice
    val payloadLen = blob.length - Multimodal.HeaderLen
    assert(fr.numElements() <= payloadLen)
    assert((0 until fr.numElements()).forall(i => fr.getBinary(i).length >= 1))
  }

  test("AU with the spec-legal unknown data size recovers frames from the PCM decode") {
    // hand-rolled big-endian AU: ".snd", dataOffset=24, dataSize=0xFFFFFFFF
    // (unknown), encoding=3 (PCM16 BE), rate=8000, channels=1, 8 samples
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7, -7, 1000)
    val au = new Array[Byte](24 + samples.length * 2)
    def be32(off: Int, v: Int): Unit = {
      au(off) = (v >>> 24).toByte; au(off + 1) = (v >>> 16).toByte
      au(off + 2) = (v >>> 8).toByte; au(off + 3) = v.toByte
    }
    au(0) = '.'; au(1) = 's'; au(2) = 'n'; au(3) = 'd'
    be32(4, 24); be32(8, 0xffffffff); be32(12, 3); be32(16, 8000); be32(20, 1)
    samples.indices.foreach { i =>
      au(24 + 2 * i) = (samples(i) >> 8).toByte; au(24 + 2 * i + 1) = samples(i).toByte
    }
    val r = Multimodal.audioMetaKernel(au)
    assert(r != null, "unknown-size AU must still decode")
    assert(r.getLong(4) == 8L, s"frames=${r.getLong(4)} — never the -1 sentinel")
    assert(r.getLong(5) == 1L) // 8 frames @ 8 kHz = 1 ms
    assert(r.getDouble(6) ==
      samples.map(s => math.abs(s.toLong)).sum.toDouble / (8 * 32768.0))
  }

  test("wav_pack guards the sample-count bound instead of wrapping negative") {
    intercept[IllegalArgumentException] {
      Multimodal.wavPackKernel(1L, 8000, 1 << 12, 1 << 20) // 2^32 samples
    }
    intercept[IllegalArgumentException] {
      Multimodal.wavPackKernel(1L, 8000, 1, -1)
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.Avi.packKernel(1L, 8, 8, 10, Int.MaxValue)
    }
  }

  test("video: corrupt, truncated, or non-AVI bytes dead-letter as null") {
    import graft.multimodal.Avi
    assert(Avi.metaKernel(Array[Byte](1, 2, 3)) == null)
    assert(Avi.metaKernel("RIFFxxxxAVI junkjunkjunk".getBytes) == null)
    val avi = Avi.packKernel(7L, 32, 32, 10, 3)
    assert(Avi.metaKernel(java.util.Arrays.copyOf(avi, avi.length - 10)) == null)
    assert(Avi.framesKernel(java.util.Arrays.copyOf(avi, avi.length - 10), 1) == null)
    // and through the expression (null column, no exception)
    val viaExpr = Seq((1L, Array[Byte](82, 73, 70, 70))).toDF("doc_id", "content")
      .select(video_meta(col("content")).as("v")).collect()(0)
    assert(viaExpr.isNullAt(0))
  }

  test("MediaDecoder routes real WAV bytes to the audio path") {
    val wav = Multimodal.wavPackKernel(7L, 8000, 1, 40)
    val rows = Multimodal.decodePartitions(
      Seq(Multimodal.MediaRow(7L, "audio", wav)).toDS()).collect()
    val expect = (0 until 40).map(j =>
      java.lang.Math.floorMod(7L * 31 + j.toLong * 7919, 65536L) - 32768L)
    assert(rows(0) == Multimodal.DecodedRow(7L, "audio", 40, 1,
      expect.map(math.abs).sum.toDouble / (40 * 32768.0)))
  }
}
