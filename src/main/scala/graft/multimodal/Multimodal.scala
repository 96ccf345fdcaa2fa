package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * Header-described metadata decodes for REAL in pure JVM — BMP/PNG/GIF
  * dimensions, JPEG dimensions via the marker walk, RIFF/WAV PCM (header
  * walk + sample extraction) need no codec library. PIXEL decode is also
  * real for PNG/JPEG/GIF/BMP via the JDK's own ImageIO readers
  * ([[Multimodal.decodeImage]]) — only formats the JVM ships no codec for
  * (MP3, H.264, WebP) remain behind `decodeStub`, a labeled deterministic
  * fake.
  * Everything around the decode is production Spark: the binary schema,
  * the batched mapPartitions shape (the Scala analog of mapInPandas: one
  * iterator per partition, amortized per-batch setup), and streaming
  * per-row processing so a 100 TB media corpus flows through executors
  * without materializing a partition in memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bytes", BinaryType),
    StructField("mime", StringType)))

  case class MediaMeta(media_id: Long, n_bytes: Long, format: String,
                       width: Int, height: Int, n_frames: Int,
                       sample_rate: Int, channels: Int, fingerprint: Long)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Known BITMAPINFOHEADER sizes — validates the sniff beyond the 2-byte
    * "BM" magic, which ordinary text can start with.
    */
  private val BmpDibSizes = Set(12, 40, 52, 56, 64, 108, 124)

  /** BMP header: magic "BM", a known DIB header size at 14. The INFO
    * family (size >= 40) stores int32 width at 18 and int32 height at 22
    * (may be negative = top-down); the OS/2 CORE header (size 12) stores
    * uint16 width at 18 and uint16 height at 20 — reading int32s there
    * would fuse width|height and planes|bitcount into garbage dimensions.
    */
  def parseBmp(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val dib = leInt(b, 14)
      if (dib == 12) {
        val (w, h) = (leShort(b, 18), leShort(b, 20))
        if (w > 0 && h > 0) Some((w, h)) else None
      } else if (BmpDibSizes.contains(dib) && leInt(b, 18) > 0 && leInt(b, 22) != 0)
        Some((leInt(b, 18), math.abs(leInt(b, 22))))
      else None
    } else None

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** PNG: 8-byte signature, the IHDR chunk tag at 12, width/height
    * big-endian at 16/20 — validating the tag and positive dimensions
    * demotes a truncated-then-padded payload to the unknown path instead
    * of reporting a "valid" 0×0 png.
    */
  def parsePng(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      tag(b, 12) == "IHDR" && beInt(b, 16) > 0 && beInt(b, 20) > 0)
      Some((beInt(b, 16), beInt(b, 20)))
    else None

  /** GIF: full 6-byte "GIF87a"/"GIF89a" magic (a 3-byte prefix would match
    * prose), little-endian logical-screen width/height at 6/8.
    */
  def parseGif(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 10) return None
    val magic = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if ((magic == "GIF87a" || magic == "GIF89a") &&
      leShort(b, 6) > 0 && leShort(b, 8) > 0)
      Some((leShort(b, 6), leShort(b, 8)))
    else None
  }

  /** GIF frame count: number of image-descriptor blocks (0x2C) in the
    * stream — real animation frame metadata, no LZW decode needed (frame
    * pixel data rides length-prefixed sub-blocks that skip in O(1) each).
    * Returns None on a malformed block sequence.
    */
  def gifFrameCount(b: Array[Byte]): Option[Int] = {
    if (parseGif(b).isEmpty || b.length < 14) return None
    val gctFlags = b(10) & 0xff
    var off = 13 + (if ((gctFlags & 0x80) != 0) 3 * (2 << (gctFlags & 7)) else 0)
    var frames = 0
    def skipSubBlocks(): Boolean = {
      while (off < b.length && (b(off) & 0xff) != 0) {
        off += 1 + (b(off) & 0xff)
      }
      if (off >= b.length) false else { off += 1; true } // consume terminator
    }
    while (off < b.length) {
      (b(off) & 0xff) match {
        case 0x2c => // image descriptor
          if (off + 10 > b.length) return None
          val lctFlags = b(off + 9) & 0xff
          off += 10 + (if ((lctFlags & 0x80) != 0) 3 * (2 << (lctFlags & 7)) else 0)
          off += 1 // LZW minimum code size
          if (!skipSubBlocks()) return None
          frames += 1
        case 0x21 => // extension: label byte then sub-blocks
          off += 2
          if (!skipSubBlocks()) return None
        case 0x3b => return Some(frames) // trailer
        case _ => return None
      }
    }
    Some(frames) // missing trailer: tolerate, report what was seen
  }

  /** JPEG: walk marker segments for a start-of-frame (0xC0-0xCF minus
    * C4/C8/CC); height/width are big-endian at segment offsets 5/7. The
    * dimensions live in the headers — no entropy decode needed.
    */
  def parseJpeg(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var off = 2
    while (off + 9 < b.length) {
      if ((b(off) & 0xff) != 0xff) return None
      val marker = b(off + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
        off += 2 // standalone marker, no length
      } else {
        val len = beShort(b, off + 2)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some((beShort(b, off + 7), beShort(b, off + 5))) // (width, height)
        off += 2 + len
      }
    }
    None
  }

  /** First image parser that recognizes the payload. */
  def parseImage(b: Array[Byte]): Option[(String, Int, Int)] =
    parseBmp(b).map { case (w, h) => ("bmp", w, h) }
      .orElse(parsePng(b).map { case (w, h) => ("png", w, h) })
      .orElse(parseGif(b).map { case (w, h) => ("gif", w, h) })
      .orElse(parseJpeg(b).map { case (w, h) => ("jpeg", w, h) })

  /** RIFF/WAV: walk chunks for "fmt " (channels, sample rate, bits) and
    * "data" (payload length) → (sampleRate, channels, bitsPerSample,
    * nSampleFrames, dataOffset).
    */
  def parseWav(b: Array[Byte]): Option[(Int, Int, Int, Long, Int)] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    // the walk cursor is a Long: a corrupt chunk size near Int.MaxValue
    // would wrap an Int cursor negative and index out of bounds
    var off = 12L
    var rate = 0; var ch = 0; var bits = 0
    var dataLen = 0L; var dataOff = -1
    while (off + 8 <= b.length) {
      val o = off.toInt // safe: off + 8 <= b.length <= Int.MaxValue
      val id = tag(b, o)
      val sz = leInt(b, o + 4)
      // a corrupt/negative chunk size would stall or reverse the walk —
      // treat the rest of the payload as garbage instead of looping
      if (sz < 0) return None
      if (id == "fmt " && off + 8 + 16 <= b.length) {
        ch = leShort(b, o + 10)
        rate = leInt(b, o + 12)
        bits = leShort(b, o + 22)
      } else if (id == "data") {
        dataLen = sz.toLong & 0xffffffffL
        dataOff = o + 8
      }
      off += 8L + sz + (sz & 1) // chunks are word-aligned
    }
    // whole sample frames only: bits must be a positive multiple of 8
    if (rate > 0 && ch > 0 && bits >= 8 && bits % 8 == 0 && dataOff >= 0)
      Some((rate, ch, bits, dataLen / (ch.toLong * (bits / 8)), dataOff))
    else None
  }

  /** Deterministic fake decode for formats the JDK ships no codec for
    * (MP3, H.264, WebP, ...): dimensions and frame count derived from the
    * payload length (replayable by an external oracle from octet_length).
    * PNG/JPEG/GIF/BMP pixel decode is REAL — see [[decodeImage]].
    */
  def decodeStub(n: Long): (Int, Int, Int) =
    (64 + (n % 1024).toInt, 64 + ((n * 31) % 1024).toInt, 1 + (n % 32).toInt)

  /** REAL pixel decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP readers
    * ship in the JVM — no external codec dependency). Returns None for
    * unrecognized/corrupt payloads instead of throwing, so one bad row
    * can't fail a 100 TB job. The disk-backed stream cache is disabled
    * once per executor: media flows memory-to-memory.
    */
  // JVM-global, genuinely once per executor (lazy val), not re-set on
  // every row of the decode hot path
  private lazy val imageIoNoCache: Unit = javax.imageio.ImageIO.setUseCache(false)

  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageIoNoCache
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Encode a BufferedImage back to PNG bytes (lossless, so a
    * decode→encode→decode round-trip is pixel-exact). */
  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    imageIoNoCache
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic nearest-neighbor resize to fit `maxDim` (aspect
    * preserved, integer math: dst(x,y) = src(x·srcW/dstW, y·srcH/dstH)) —
    * chosen over Graphics2D interpolation because the result is exactly
    * reproducible by an external oracle, and thumbnail pipelines at scale
    * care about determinism (dedup over thumbnails) more than quality.
    */
  def resizeNearest(img: java.awt.image.BufferedImage, maxDim: Int): java.awt.image.BufferedImage = {
    val (w, h) = (img.getWidth, img.getHeight)
    val m = math.max(w, h)
    val (dw, dh) = (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
    val out = new java.awt.image.BufferedImage(dw, dh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < dh) {
      var x = 0
      while (x < dw) {
        out.setRGB(x, y, img.getRGB(x * w / dw, y * h / dh))
        x += 1
      }
      y += 1
    }
    out
  }

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL image feature extraction: ImageIO pixel decode → per-channel
    * means. Streaming mapPartitions like [[extractMeta]]; rows that don't
    * decode produce no output (corrupt-tolerant). `resizeTo > 0` routes
    * pixels through [[resizeNearest]] first — the thumbnail-then-featurize
    * pipeline shape.
    */
  def imageFeatures(df: DataFrame, idCol: String, bytesCol: String,
                    resizeTo: Int = 0): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](bIdx)
        decodeImage(if (raw == null) Array.emptyByteArray else raw).map { img0 =>
          val img = if (resizeTo > 0) resizeNearest(img0, resizeTo) else img0
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          ImageFeatures(r.getLong(idIdx), w, h,
            sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
        }
      }
    }(Encoders.product[ImageFeatures]).toDF()
  }

  /** Box-averaged grayscale downsample to a gw×gh grid: each cell is the
    * mean gray ((r+g+b)/3) of its source-pixel rectangle. Averaging (not
    * nearest-neighbor sampling) pools EVERY source pixel, so the grid —
    * and the perceptual hashes built on it — is stable across
    * resolutions of the same content.
    */
  private def grayGrid(img: java.awt.image.BufferedImage,
                       gw: Int, gh: Int): Array[Double] = {
    val (w, h) = (img.getWidth, img.getHeight)
    // ONE bulk pixel grab: per-pixel getRGB goes through the colour-model
    // conversion per call — the slowest access path — and hash callers
    // walk every pixel
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    grayGridPx(px, w, h, gw, gh)
  }

  private def grayGridPx(px: Array[Int], w: Int, h: Int,
                         gw: Int, gh: Int): Array[Double] = {
    val out = new Array[Double](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.max(y0 + 1, (cy + 1) * h / gh)
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.max(x0 + 1, (cx + 1) * w / gw)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = px(y * w + x)
            s += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
            x += 1
          }
          y += 1
        }
        out(cy * gw + cx) = s.toDouble / (3.0 * (y1 - y0) * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    out
  }

  case class ImageHashes(media_id: Long, width: Int, height: Int,
                         ahash: Long, dhash: Long)

  /** Perceptual image hashes — the standard cheap image near-dup
    * primitives over the REAL decode path: aHash (8×8 box-averaged gray
    * grid, bit = cell ≥ grid mean) and dHash (9×8 grid, bit = RIGHT
    * neighbor brighter than the cell), MSB-first row-major. Identical
    * content at different resolutions hashes identically (box averaging);
    * near-duplicate images land within a few Hamming bits, so pairing is
    * an exact-match groupBy on the hash — or banded buckets for a
    * tolerance, the same machinery as simhash — never an all-pairs scan.
    * Rows that fail to decode produce no output (corrupt-tolerant).
    */
  def imageHashes(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](bIdx)
        decodeImage(if (raw == null) Array.emptyByteArray else raw).map { img =>
          // fetch the pixels ONCE; both grids share the buffer
          val (w, h) = (img.getWidth, img.getHeight)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          val a8 = grayGridPx(px, w, h, 8, 8)
          val mean = a8.sum / 64.0
          var ah = 0L
          var i = 0
          while (i < 64) { if (a8(i) >= mean) ah |= 1L << (63 - i); i += 1 }
          val d9 = grayGridPx(px, w, h, 9, 8)
          var dh = 0L
          var b = 0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (d9(y * 9 + x + 1) > d9(y * 9 + x)) dh |= 1L << (63 - b)
              b += 1; x += 1
            }
            y += 1
          }
          ImageHashes(r.getLong(idIdx), img.getWidth, img.getHeight, ah, dh)
        }
      }
    }(Encoders.product[ImageHashes]).toDF()
  }

  private def fnv(bytes: Array[Byte]): Long = {
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 1099511628211L; i += 1 }
    h
  }

  /** Feature extraction over a binary media column: one sequential pass
    * per partition (mapPartitions), per-row decode by sniffed format,
    * typed metadata out.
    */
  def extractMeta(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val raw = r.getAs[Array[Byte]](bIdx)
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val id = r.getLong(idIdx)
        val n = bytes.length.toLong
        val fp = fnv(bytes)
        // one malformed payload must not fail a 100 TB job: any parser
        // escape (corrupt header beyond the explicit guards) demotes the
        // row to the unknown/stub path instead of throwing
        try parseImage(bytes) match {
          case Some((fmt, w, h)) =>
            val frames = if (fmt == "gif") gifFrameCount(bytes).getOrElse(1).max(1) else 1
            MediaMeta(id, n, fmt, w, h, frames, 0, 0, fp)
          case None => parseWav(bytes) match {
            case Some((rate, ch, _, frames, _)) =>
              MediaMeta(id, n, "wav", 0, 0,
                math.min(frames, Int.MaxValue).toInt, rate, ch, fp)
            case None =>
              val (w, h, fr) = decodeStub(n)
              MediaMeta(id, n, "unknown", w, h, fr, 0, 0, fp)
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            val (w, h, fr) = decodeStub(n)
            MediaMeta(id, n, "unknown", w, h, fr, 0, 0, fp)
        }
      }
    }(Encoders.product[MediaMeta]).toDF()
  }

  /** Frame index sampling: every `step`-th frame per media row — the
    * explode-side shape (1 input row → n output rows). A lazy iterator
    * per row, NOT explode(sequence(...)): the sequence form materializes
    * the whole index array per row first (hundreds of MB for a long
    * recording's hundred-million frames) and fabricates a phantom frame 0
    * for zero-frame media (sequence(0, max(n−1, 0)) is never empty).
    */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame = {
    require(step >= 1, s"frame sampling step must be >= 1, got $step")
    val spark = meta.sparkSession
    import spark.implicits._
    // NULL media_id/n_frames rows (a caller-supplied meta frame, not one
    // built from MediaMeta's primitive fields) sample no frames — the
    // typed .as[(Long, Int)] decode would otherwise throw an opaque
    // executor NullPointerException on the first null
    meta.filter(col("media_id").isNotNull && col("n_frames").isNotNull)
      .select(col("media_id").cast("long"), col("n_frames").cast("int"))
      .as[(Long, Int)]
      .flatMap { case (id, n) => (0 until n by step).iterator.map(i => (id, i)) }
      .toDF("media_id", "frame_idx")
  }

  case class PcmSample(media_id: Long, sample_idx: Long, amplitude: Double)

  /** REAL audio feature extraction: every `step`-th 16-bit PCM sample
    * frame (channel 0) from WAV payloads, amplitude normalized to [-1, 1).
    * Non-WAV rows produce no output. Streaming per partition — samples are
    * emitted lazily, never buffering a row's full audio.
    */
  def samplePcm(df: DataFrame, idCol: String, bytesCol: String, step: Int): DataFrame = {
    // step 0 would throw "step cannot be 0" from inside an executor task;
    // negative steps would silently emit nothing
    require(step >= 1, s"PCM sampling step must be >= 1, got $step")
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val raw = r.getAs[Array[Byte]](bIdx)
        val bytes = if (raw == null) Array.emptyByteArray else raw
        val id = r.getLong(idIdx)
        // corrupt headers skip the row rather than failing the job
        (try parseWav(bytes) catch { case scala.util.control.NonFatal(_) => None }) match {
          case Some((_, ch, bits, frames, dataOff)) if bits == 16 =>
            val frameBytes = ch * 2
            (0L until frames by step.toLong).iterator.flatMap { i =>
              val off = dataOff + i * frameBytes
              if (off + 1 < bytes.length) {
                val s = ((bytes(off.toInt) & 0xff) |
                  (bytes(off.toInt + 1) << 8)).toShort
                Some(PcmSample(id, i, s / 32768.0))
              } else None
            }
          case _ => Iterator.empty
        }
      }
    }(Encoders.product[PcmSample]).toDF()
  }
}
