package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom sidecar over a landing-dedup BUCKET table — the index that makes
  * the per-batch stored-corpus probe ~FLAT in the retained corpus.
  *
  * Why an index at all: the probe asks "do any of the batch's O(batch ×
  * bands) uniform 64-bit bucket hashes exist in the stored table?" — a
  * point-lookup workload. Parquet's own pruning machinery cannot answer
  * it sublinearly (measured, round 14): row-group min/max stats never
  * eliminate anything for uniform keys (every group's range contains
  * some probe value), a pushed In compiles to a LEFT-DEEP or()-chain
  * that overflows the task stack beyond ~1.5k values, and chunking the
  * In just multiplies full scans. The reference answers the same lookup
  * with its per-series B-trees (btree.c); the lakehouse-native analog is
  * a bloom sidecar: one small file of hashed membership bits, checked on
  * the driver in microseconds per value.
  *
  * CORRECTNESS CONTRACT — the bloom is an ACCELERATOR, never an oracle:
  *  - SUPERSET INVARIANT: the sidecar always contains every bucket value
  *    the stored table holds (update lands BEFORE the bucket append; a
  *    crash between leaves the bloom a harmless superset; deletes and
  *    folds only shrink the table). A missing/corrupt/unreadable sidecar
  *    degrades the probe to the full scan — never to a wrong answer.
  *  - POSITIVES ARE VERIFIED: a bloom hit only admits a bucket value into
  *    the probe's exact scan filter; membership is decided by the real
  *    join against stored rows. False positives cost a little I/O, not
  *    semantics. (This is also why retention needs no bloom deletion:
  *    expired buckets linger as false-positive bits until a rebuild.)
  *
  * Sizing: `graft.dedup.probe.bloom.items` (default 1e6 expected values
  * at 1% fpp ≈ 1.2 MB). A saturated bloom (table outgrew the sidecar)
  * raises the false-positive rate, which pushes the probe toward the
  * scan fallback — slower, still exact. [[rebuild]] re-sizes from the
  * live table (run it at fold cadence, or after retention trimmed the
  * table, to shed stale bits).
  */
private[graft] object DedupBloom {

  private def sidecar(hp: Path): Path =
    new Path(hp.getParent, hp.getName + ".bloom")

  private def expectedItems: Long =
    sys.props.get("graft.dedup.probe.bloom.items").flatMap(_.toLongOption)
      .getOrElse(1000000L)

  /** (mtime, length)-validated read-through cache: the sidecar is read at
    * most once per version per process — per-batch cost is one metadata
    * getFileStatus, not a file read.
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, BloomFilter)]()

  /** The sidecar's bloom, or None when absent/unreadable (probe then
    * falls back to the full scan — the always-correct path).
    */
  def load(spark: SparkSession, bucketPath: String): Option[BloomFilter] = {
    val hp = new Path(bucketPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = sidecar(hp)
    scala.util.Try {
      val st = fs.getFileStatus(p)
      val key = fs.makeQualified(p).toString
      val hit = Option(cache.get(key))
        .filter(c => c._1 == st.getModificationTime && c._2 == st.getLen)
      hit.map(_._3).getOrElse {
        val in = fs.open(p)
        val bf = try BloomFilter.readFrom(in) finally in.close()
        cache.put(key, (st.getModificationTime, st.getLen, bf))
        bf
      }
    }.toOption
  }

  private def write(fs: FileSystem, hp: Path, bf: BloomFilter): Unit = {
    val target = sidecar(hp)
    val tmp = new Path(target.getParent, target.getName + ".tmp")
    val out = fs.create(tmp, true)
    try bf.writeTo(out) finally out.close()
    // delete+rename window: a reader landing inside it sees no sidecar
    // and takes the scan fallback — degraded, never wrong
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      scala.util.Try(fs.delete(tmp, false))
      sys.error(s"bloom sidecar install failed: $tmp -> $target")
    }
    // re-cache under the installed version: without this every
    // post-update probe would re-read the sidecar file (each batch
    // writes one), defeating the read-through cache in steady state
    scala.util.Try {
      val st = fs.getFileStatus(target)
      cache.put(fs.makeQualified(target).toString,
        (st.getModificationTime, st.getLen, bf))
    }
  }

  /** Extend the sidecar with a batch's bucket values — called BEFORE the
    * bucket-table append so a crash between the two preserves the
    * superset invariant. An absent sidecar bootstraps: from the batch
    * alone when the table is empty/absent (nothing older to cover), else
    * by a one-time [[rebuild]] from the live table first.
    */
  def update(spark: SparkSession, bucketPath: String,
             newBuckets: Array[Long]): Unit = {
    if (newBuckets.isEmpty) return
    val hp = new Path(bucketPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bf = load(spark, bucketPath).getOrElse {
      if (fs.exists(hp) &&
          scala.util.Try(graft.io.Tables.snapshotUnsized(spark, bucketPath)
            .head(1).nonEmpty).getOrElse(false))
        rebuilt(spark, bucketPath)
      else BloomFilter.create(expectedItems, 0.01)
    }
    newBuckets.foreach(bf.putLong)
    write(fs, hp, bf)
  }

  private def rebuilt(spark: SparkSession, bucketPath: String): BloomFilter = {
    val live = graft.io.Tables.snapshotUnsized(spark, bucketPath)
    val n = live.count()
    // distributed build (df.stat.bloomFilter), sized 2× the live rows so
    // the rebuilt sidecar has growth headroom before the next rebuild
    live.stat.bloomFilter("bucket", math.max(expectedItems, 2 * n), 0.01)
  }

  /** Rebuild the sidecar exactly from the live table — run at fold
    * cadence or after retention to shed stale bits and re-size.
    */
  def rebuild(spark: SparkSession, bucketPath: String): Unit = {
    val hp = new Path(bucketPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    write(fs, hp, rebuilt(spark, bucketPath))
  }
}
