package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The actual media decode (JPEG/audio codecs) is STUBBED — the container
  * has no media libraries — behind `decodeStub`, a deterministic fake that
  * derives "metadata" from the bytes. Everything around it is real Spark:
  * the binary schema, the batched mapPartitions shape (the Scala analog of
  * mapInPandas: one iterator per partition, amortized per-batch setup),
  * and partition sizing so a 100 TB media corpus streams through executors
  * without materializing a partition in memory.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bytes", BinaryType),
    StructField("mime", StringType)))

  case class MediaMeta(media_id: Long, n_bytes: Long, width: Int, height: Int,
                       n_frames: Int, fingerprint: Long)

  /** Deterministic fake decode: dimensions/frame count derived from the
    * payload length (so an external oracle can replay them from
    * octet_length), fingerprint from an FNV-1a rolling hash of the bytes.
    * Replace with a real codec call in production (???).
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Long) = {
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 1099511628211L; i += 1 }
    val n = bytes.length.toLong
    val w = 64 + (n % 1024).toInt
    val ht = 64 + ((n * 31) % 1024).toInt
    val fr = 1 + (n % 32).toInt
    (w, ht, fr, h)
  }

  /** Feature extraction over a binary media column: one sequential pass
    * per partition (mapPartitions), per-row decode, typed metadata out.
    */
  def extractMeta(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val (w, h, fr, fp) = decodeStub(bytes)
        MediaMeta(r.getLong(idIdx), bytes.length.toLong, w, h, fr, fp)
      }
    }(Encoders.product[MediaMeta]).toDF()
  }

  /** Frame sampling stub: emit every `step`-th "frame index" per media row
    * — demonstrates the explode-side shape (1 input row → n output rows)
    * without a codec.
    */
  def sampleFrames(meta: DataFrame, step: Int): DataFrame =
    meta.withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(step))))
      .select(col("media_id"), col("frame_idx"))
}
