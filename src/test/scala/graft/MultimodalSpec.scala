package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-format decode paths: synthesized WAV (RIFF/PCM16) and BMP bytes. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Minimal valid 16-bit PCM WAV with the given mono samples. */
  def wavBytes(rate: Int, samples: Seq[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + dataLen); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)            // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2)      // byte rate
    bb.putShort(2); bb.putShort(16)           // block align, bits
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Minimal BMP header (no pixel data needed for metadata). */
  def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte); bb.put('M'.toByte); bb.putInt(54)
    bb.putInt(0); bb.putInt(54); bb.putInt(40)
    bb.putInt(w); bb.putInt(h)
    bb.array()
  }

  test("WAV metadata and PCM sampling decode for real") {
    val samples = (0 until 100).map(i => (i * 300 - 15000).toShort)
    val df = Seq((1L, wavBytes(8000, samples), "audio/wav")).toDF("media_id", "bytes", "mime")
    val meta = Multimodal.extractMeta(df, "media_id", "bytes")
    val m = meta.select("format", "sample_rate", "channels", "n_frames")
      .as[(String, Int, Int, Int)].head()
    assert(m == (("wav", 8000, 1, 100)))
    val pcm = Multimodal.samplePcm(df, "media_id", "bytes", 10)
      .orderBy("sample_idx").as[(Long, Long, Double)].collect()
    assert(pcm.length == 10)
    assert(pcm.map(_._2).toSeq == (0L until 100L by 10L))
    pcm.foreach { case (_, i, a) =>
      assert(math.abs(a - samples(i.toInt) / 32768.0) < 1e-12)
    }
  }

  test("BMP metadata decodes width and height") {
    val df = Seq((2L, bmpBytes(7, 5), "image/bmp")).toDF("media_id", "bytes", "mime")
    val m = Multimodal.extractMeta(df, "media_id", "bytes")
      .select("format", "width", "height", "n_frames").as[(String, Int, Int, Int)].head()
    assert(m == (("bmp", 7, 5, 1)))
  }

  test("PNG, GIF, and JPEG dimensions parse from headers") {
    val png = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
        0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13); bb.put("IHDR".getBytes)
      bb.putInt(640); bb.putInt(480)
      bb.array()
    }
    val gif = {
      val bb = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes); bb.putShort(320); bb.putShort(200)
      bb.array()
    }
    val jpeg = {
      // SOI, APP0 (len 4), SOF0 (len 17: precision + h + w + ...)
      val bb = java.nio.ByteBuffer.allocate(2 + 2 + 4 + 2 + 2 + 15)
      bb.putShort(0xffd8.toShort)
      bb.putShort(0xffe0.toShort); bb.putShort(4); bb.putShort(0)
      bb.putShort(0xffc0.toShort); bb.putShort(17); bb.put(8.toByte)
      bb.putShort(1080.toShort); bb.putShort(1920.toShort)
      bb.array()
    }
    assert(Multimodal.parsePng(png).contains((640, 480)))
    assert(Multimodal.parseGif(gif).contains((320, 200)))
    assert(Multimodal.parseJpeg(jpeg).contains((1920, 1080)))
    val df = Seq((10L, png, "image/png"), (11L, gif, "image/gif"), (12L, jpeg, "image/jpeg"))
      .toDF("media_id", "bytes", "mime")
    val m = Multimodal.extractMeta(df, "media_id", "bytes")
      .orderBy("media_id").select("format", "width", "height")
      .as[(String, Int, Int)].collect().toSeq
    assert(m == Seq(("png", 640, 480), ("gif", 320, 200), ("jpeg", 1920, 1080)))
  }

  test("animated GIF frame count: image descriptors walked without LZW decode") {
    // GIF89a, 2x1 screen, no global color table, graphic-control extension
    // + two 1x1 frames (1-byte LZW sub-block each), trailer
    def frame(): Array[Byte] = Array[Byte](
      0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0, // image descriptor, no LCT
      2,                               // LZW min code size
      1, 0x44,                         // one 1-byte data sub-block
      0)                               // sub-block terminator
    val header = "GIF89a".getBytes ++ Array[Byte](2, 0, 1, 0, 0, 0, 0)
    val ext = Array[Byte](0x21.toByte, 0xf9.toByte, 4, 0, 10, 0, 0, 0)
    val gif2 = header ++ ext ++ frame() ++ frame() ++ Array[Byte](0x3b)
    assert(Multimodal.gifFrameCount(gif2).contains(2))
    val df = Seq((20L, gif2, "image/gif")).toDF("media_id", "bytes", "mime")
    val m = Multimodal.extractMeta(df, "media_id", "bytes")
      .select("format", "n_frames").as[(String, Int)].head()
    assert(m == (("gif", 2)))
    // truncated mid-frame -> parse fails closed, meta falls back to 1 frame
    assert(Multimodal.gifFrameCount(gif2.dropRight(4)).isEmpty)
  }

  test("unknown formats fall back to the deterministic stub") {
    val df = Seq((3L, Array[Byte](1, 2, 3, 4, 5), "application/octet-stream"))
      .toDF("media_id", "bytes", "mime")
    val m = Multimodal.extractMeta(df, "media_id", "bytes")
      .select("format", "n_bytes").as[(String, Long)].head()
    assert(m == (("unknown", 5L)))
  }

  test("ImageIO pixel decode: PNG encode/decode round-trip is exact") {
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 3) img.setRGB(x, y, (x * 40 << 16) | (y * 90 << 8) | 17)
    val decoded = Multimodal.decodeImage(Multimodal.encodePng(img)).get
    assert(decoded.getWidth == 3 && decoded.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert((decoded.getRGB(x, y) & 0xffffff) == ((x * 40 << 16) | (y * 90 << 8) | 17))
    // corrupt payload decodes to None, never throws (a truncated tail may
    // still decode — ImageIO salvages complete rows — so only assert the
    // unrecognizable case)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("nearest-neighbor resize is the exact integer-math mapping") {
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, x + 10 * y)
    val out = Multimodal.resizeNearest(img, 2)
    assert(out.getWidth == 2 && out.getHeight == 1)
    // dst(x, y) = src(x*4/2, y*2/1) = src(2x, 2y)
    assert((out.getRGB(0, 0) & 0xffffff) == 0 && (out.getRGB(1, 0) & 0xffffff) == 2)
  }

  test("imageFeatures: channel means over decoded pixels, corrupt rows dropped") {
    val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00)
    img.setRGB(0, 1, 0x0000ff); img.setRGB(1, 1, 0x000000)
    val df = Seq((1L, Multimodal.encodePng(img)), (2L, Array[Byte](9, 9)))
      .toDF("media_id", "bytes")
    val rows = Multimodal.imageFeatures(df, "media_id", "bytes").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Double]("mean_r") == 255.0 / 4)
    assert(r.getAs[Double]("mean_g") == 255.0 / 4)
    assert(r.getAs[Double]("mean_b") == 255.0 / 4)
  }

  test("perceptual hashes: gradient bit patterns, resolution invariance, discrimination") {
    import spark.implicits._
    def gradient(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = x * 255 / (w - 1)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      Multimodal.encodePng(img)
    }
    def checker(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (((x / 8) + (y / 8)) % 2 == 0) 0xFFFFFF else 0)
      Multimodal.encodePng(img)
    }
    val df = Seq((1L, gradient(64, 64)), (2L, gradient(80, 80)),
      (3L, checker(64, 64))).toDF("media_id", "bytes")
    val r = Multimodal.imageHashes(df, "media_id", "bytes")
      .orderBy("media_id").collect()
      .map(x => (x.getLong(0), x.getAs[Long]("ahash"), x.getAs[Long]("dhash")))
    // left-dark→right-light: aHash rows are 00001111, dHash all ones
    assert(r(0)._2 == 0x0F0F0F0F0F0F0F0FL)
    assert(r(0)._3 == -1L)
    // same content at a different resolution: identical hashes
    assert(r(1)._2 == r(0)._2 && r(1)._3 == r(0)._3)
    // a different image is far away in Hamming distance
    assert(java.lang.Long.bitCount(r(2)._2 ^ r(0)._2) > 16)
  }

  test("banded-hamming pairing over image hashes: pigeonhole-exact at the boundary") {
    import spark.implicits._
    // synthetic 64-bit hashes with engineered distances straddling the
    // maxDist=7 threshold; distances spread ACROSS bands so a pair can
    // only be found through the band that happens to stay equal
    val base = 0x5A5A5A5A5A5A5A5AL
    def flip(h: Long, bits: Seq[Int]): Long = bits.foldLeft(h)((a, b) => a ^ (1L << b))
    val rows = Seq(
      (0L, base),
      (1L, base),                                      // d(0,1)=0
      (2L, flip(base, Seq(0, 9, 18, 27, 36, 45, 54))), // d(0,2)=7, one bit in 7 bands
      (3L, flip(base, Seq(1, 10, 19, 28, 37, 46, 55, 63))), // d(0,3)=8 — over
      (4L, flip(base, Seq(2, 3, 4))))                  // d(0,4)=3, all in band 0
    val df = rows.toDF("media_id", "ahash")
    val pairs = graft.dedup.Dedup.hammingPairs64(df, "media_id", "ahash",
      bands = 8, maxDist = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force all-pairs ≤ 7 for cross-check
    val exact = (for {
      (i, hi) <- rows; (j, hj) <- rows if i < j
      d = java.lang.Long.bitCount(hi ^ hj) if d <= 7
    } yield (i, j, d.toLong)).toSet
    assert(pairs == exact)
    assert(pairs.contains((0L, 2L, 7L)) && !pairs.exists(p => p._1 == 0L && p._2 == 3L))
  }

  test("hammingPairs64 rejects id/hash columns named after its working names") {
    val df = Seq((1L, 2L)).toDF("band", "h")
    val e = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingPairs64(df, "band", "h")
    }
    assert(e.getMessage.contains("band"))
    val e2 = intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingPairs64(df.toDF("id", "__h64"), "id", "__h64")
    }
    assert(e2.getMessage.contains("__h64"))
  }

  test("OS/2 CORE BMP headers read uint16 dimensions, not int32 garbage") {
    // DIB size 12: uint16 width at 18, uint16 height at 20
    val b = new Array[Byte](26)
    b(0) = 'B'; b(1) = 'M'
    b(14) = 12 // core header size (LE)
    b(18) = 100.toByte; b(19) = 0 // width 100
    b(20) = 50.toByte; b(21) = 0  // height 50
    assert(Multimodal.parseBmp(b).contains((100, 50)))
  }

  test("PNG parse demotes corrupt payloads (bad IHDR tag or zero dims)") {
    val sigOnly = new Array[Byte](24)
    sigOnly(0) = 0x89.toByte; sigOnly(1) = 'P'; sigOnly(2) = 'N'; sigOnly(3) = 'G'
    assert(Multimodal.parsePng(sigOnly).isEmpty,
      "signature followed by zeros is not a valid 0x0 png")
  }

  test("sampleFrames: no phantom frame for zero-frame media; step validated") {
    val meta = Seq((1L, 5), (2L, 0)).toDF("media_id", "n_frames")
    val out = Multimodal.sampleFrames(meta, 2).orderBy("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 0), (1L, 2), (1L, 4)),
      s"zero-frame media emits no rows, got $out")
    intercept[IllegalArgumentException] { Multimodal.sampleFrames(meta, 0) }
    intercept[IllegalArgumentException] {
      Multimodal.samplePcm(meta.withColumn("bytes", lit(Array[Byte]())),
        "media_id", "bytes", 0)
    }
  }

  test("sampleFrames: NULL media_id/n_frames rows sample no frames, not an NPE") {
    // a caller-supplied meta frame (not built from MediaMeta's primitive
    // fields) can carry nulls — the typed decode would throw an opaque
    // executor NullPointerException without the filter
    val meta = Seq(
      (Some(1L), Some(3)), (None, Some(4)), (Some(3L), None)
    ).toDF("media_id", "n_frames")
    val out = Multimodal.sampleFrames(meta, 1).orderBy("media_id", "frame_idx")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(out == Seq((1L, 0), (1L, 1), (1L, 2)),
      s"null-meta rows must be skipped, got $out")
  }
}
