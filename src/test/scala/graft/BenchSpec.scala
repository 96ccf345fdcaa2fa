package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the bench's contention self-diagnosis — the two
  * per-query interference witnesses must each fire independently so the
  * recorded JSON can never pass a contaminated min silently.
  */
class BenchSpec extends AnyFunSuite {

  test("absolute witness: spread > 0.3 s flags regardless of min") {
    assert(Bench.noisyWitness(minT = 2.0, spread = 0.31))
    assert(!Bench.noisyWitness(minT = 2.0, spread = 0.29))
  }

  test("relative witness: spread > 3x min flags sub-0.3s bursts (r7 blind band)") {
    // the round-7 blind band: 0.2 s swing on a 60 ms query passed un-flagged
    assert(Bench.noisyWitness(minT = 0.06, spread = 0.2))
    // but tens-of-ms jitter on a tiny query stays under the 0.1 s floor
    assert(!Bench.noisyWitness(minT = 0.02, spread = 0.07))
    // 3x boundary itself is not enough — must exceed
    assert(!Bench.noisyWitness(minT = 0.1, spread = 0.3))
  }

  test("extreme witness needs BOTH absolute size and 3x-min dominance") {
    // round-6 failure mode: 4.04 s spread on a 0.80 s min → disqualify
    assert(Bench.extremeWitness(minT = 0.80, spread = 4.04))
    // big spread on a big query (2x min) is noisy but not extreme
    assert(!Bench.extremeWitness(minT = 1.0, spread = 0.5))
    // relative-only (small absolute) never disqualifies the whole run alone
    assert(!Bench.extremeWitness(minT = 0.06, spread = 0.2))
  }

  private def q(name: String, minT: Double, spread: Double,
                failed: Boolean = false, nreps: Int = 7) =
    Bench.QRes(name, minT, spread, cold = minT, failed,
      warm = Seq(minT, minT + spread), nreps = nreps)

  test("contendedRun: failed idle wait, 2+ noisy queries, or one extreme") {
    val clean = Seq(q("a", 0.2, 0.02), q("b", 0.5, 0.05))
    assert(!Bench.contendedRun(boxBusy = false, clean))
    // witness (a): the attempt's idle wait never observed an idle box —
    // the outcome of the wait, not a loadavg snapshot, is the evidence
    // (a mid-run sample cannot separate a tenant from our own residue)
    assert(Bench.contendedRun(boxBusy = true, clean))
    // witness (b): a PATTERN of noisy queries (one alone is a stray GC)
    assert(!Bench.contendedRun(boxBusy = false, clean :+ q("c", 1.0, 0.4)))
    assert(Bench.contendedRun(boxBusy = false,
      clean ++ Seq(q("c", 1.0, 0.4), q("d", 1.0, 0.35))))
    // witness (c): one extreme burst disqualifies alone (round-6 mode)
    assert(Bench.contendedRun(boxBusy = false, clean :+ q("c", 0.8, 4.0)))
  }

  test("maintenance witnesses: scaled thresholds catch the r16 contamination") {
    // VERDICT r16 wrong #1, verbatim from the shipped record: these
    // shipped as "clean" because maintenance entries sat outside every
    // witness. The scaled witness must flag all three.
    assert(Bench.maintNoisyWitness(minT = 2.420, spread = 3.980)) // q_compact_bucketed
    assert(Bench.maintNoisyWitness(minT = 3.529, spread = 7.714)) // q_dedup_ingest
    assert(Bench.maintNoisyWitness(minT = 0.629, spread = 3.302)) // q_delete_range
    // clean-round maintenance variance stays under it (r15: 0.553 ± 0.022;
    // measured write-cache wobble up to ~0.45 s on a 1.5 s entry is fine)
    assert(!Bench.maintNoisyWitness(minT = 0.553, spread = 0.022))
    assert(!Bench.maintNoisyWitness(minT = 1.5, spread = 0.45))
    // the extreme form needs the spread to exceed BOTH 0.5 s and the min —
    // "a spread > min is never GC" at maintenance scale
    assert(Bench.maintExtremeWitness(minT = 2.420, spread = 3.980))
    assert(!Bench.maintExtremeWitness(minT = 2.0, spread = 1.6)) // big but < min
    assert(!Bench.maintExtremeWitness(minT = 0.3, spread = 0.4)) // > min but small
  }

  private def m(name: String, minT: Double, spread: Double) =
    Bench.QRes(name, minT, spread, cold = minT, failed = false,
      warm = Seq(minT, minT + spread), maint = true, nreps = 7)

  test("maintContendedRun: noisy pattern, one extreme, or mid-run canary drift") {
    val clean = Seq(m("c1", 0.6, 0.1), m("c2", 1.5, 0.3), m("c3", 2.5, 0.4))
    assert(!Bench.maintContendedRun(0.08, 0.09, clean))
    // one extreme burst disqualifies alone (the r16 record had three)
    assert(Bench.maintContendedRun(0.08, 0.09, clean :+ m("x", 2.42, 3.98)))
    // a pattern of two noisy-but-not-extreme entries disqualifies
    assert(Bench.maintContendedRun(0.08, 0.09,
      clean ++ Seq(m("n1", 2.0, 1.6), m("n2", 3.0, 2.4))))
    // the canary RE-MEASURED between phases catches a tenant arriving
    // after the scans even when every maintenance spread squeaks under
    assert(Bench.maintContendedRun(0.08, 0.25, clean))
    assert(!Bench.maintContendedRun(0.08, 0.11, clean)) // ~floor wobble
    // a phase that never ran (no canary) can't disqualify
    assert(!Bench.maintContendedRun(0.08, -1.0, clean))
  }

  test("canary_maint_sec rides the record when the maintenance phase ran") {
    val rs = Seq(q("a", 0.2, 0.02))
    val withM = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None,
      canarySec = 0.08, canaryMaintSec = 0.092)
    assert(withM.contains("\"canary_maint_sec\":0.092"), withM)
    val without = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None, canarySec = 0.08)
    assert(!without.contains("canary_maint_sec"))
    assert(withM.count(_ == '{') == withM.count(_ == '}'))
  }

  test("waitForIdle polls until idle, gives up after the bounded wait") {
    var calls = 0
    val loads = Seq(5.0, 3.0, 0.4)
    val reached = Bench.waitForIdle(
      () => { val l = loads(math.min(calls, loads.size - 1)); calls += 1; l },
      threshold = 1.0, maxWaitSec = 60, sleepMs = 1L, log = _ => ())
    assert(reached && calls == 3)
    // permanently busy: returns false once maxWaitSec elapses, never hangs
    assert(!Bench.waitForIdle(() => 8.0, threshold = 1.0, maxWaitSec = 0,
      sleepMs = 1L, log = _ => ()))
  }

  test("renderJson: clean record has no marker; dirty-exhausted splices no_clean_run") {
    val rs = Seq(q("a", 0.2, 0.02), q("b", 0.5, 0.05))
    val clean = Bench.renderJson(rs, reps = 7, loadSec = 1.0,
      startLoad = Seq(0.1, 0.1, 0.1), endLoad = Seq(0.2, 0.2, 0.2),
      contended = false, noisy = Seq(), sfDir = "/sf", attempt = 1,
      noCleanRun = None)
    assert(!clean.contains("no_clean_run"))
    assert(clean.contains("\"contended\":false"))
    assert(clean.contains("\"value\":0.700"))
    // the marker must live INSIDE the same JSON object (an archiver that
    // keeps only the JSON line still carries the disqualification)
    val dirty = Bench.renderJson(rs, reps = 7, loadSec = 1.0,
      startLoad = Seq(9.0, 4.0, 2.0), endLoad = Seq(9.0, 4.0, 2.0),
      contended = true, noisy = Seq("a"), sfDir = "/sf", attempt = 3,
      noCleanRun = Some(3))
    assert(dirty.contains("\"no_clean_run\":true"))
    assert(dirty.contains("\"attempts\":3"))
    assert(dirty.contains("\"noisy\":[\"a\"]"))
    assert(dirty.endsWith("}") && dirty.startsWith("{"))
  }

  test("canary_sec is a standing field in both renderings") {
    // the box-floor canary (r12): round-over-round regression reads divide
    // by it — the field must exist in the compact record the driver parses
    val rs = Seq(q("a", 0.2, 0.02))
    val compact = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None, canarySec = 0.123)
    assert(compact.contains("\"canary_sec\":0.123"), compact)
    val detail = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None,
      withRepTimes = true, canarySec = 0.123)
    assert(detail.contains("\"canary_sec\":0.123"), detail)
  }

  test("warm_reps records double-rep queries, never failed ones (ADVICE r11 #2)") {
    // a failed query's warm seq collapses to one sentinel entry — it must
    // land in `failed`, never masquerade as a 1-rep warm_reps sample; a
    // double-rep query records its actual warm count
    val rs = Seq(q("a", 0.2, 0.02),
      q("x2", 0.3, 0.01, nreps = 14)
        .copy(warm = Seq.fill(13)(0.3)),
      q("dead", 0.1, 0.0, failed = true, nreps = 14))
    val sjson = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None)
    assert(sjson.contains("\"warm_reps\":{\"x2\":13}"), sjson)
    assert(!sjson.contains("\"dead\":1"), sjson)
    assert(sjson.contains("\"failed\":[\"dead\"]"), sjson)
  }

  test("rendered records parse as one JSON object (brace/quote sanity)") {
    // no JSON parser on the test classpath — pin the structural invariants
    // the driver's python-side json.load depends on instead
    val rs = Seq(q("a", 0.2, 0.02), q("fail", 0.1, 0.0, failed = true))
    val s = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, Some(2))
    assert(s.count(_ == '{') == s.count(_ == '}'))
    assert(s.count(_ == '[') == s.count(_ == ']'))
    assert(s.count(_ == '"') % 2 == 0)
    assert(s.contains("\"failed\":[\"fail\"]"))
  }

  test("maintenance ops stay out of the headline total (scan-witness exempt, own witnesses)") {
    // maintenance reps do real filesystem writes and are excluded from the
    // SCAN-calibrated contention witnesses (they get maintNoisyWitness /
    // maintContendedRun instead, r17) — letting their variance into
    // `value` would break round-over-round comparison with pre-maint
    // records
    val rs = Seq(q("a", 0.2, 0.02), q("b", 0.5, 0.05),
      Bench.QRes("m", 0.9, 0.4, 1.0, failed = false, warm = Seq(0.9, 1.3), maint = true))
    val s = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None)
    assert(s.contains("\"value\":0.700"), s)       // a + b only
    assert(s.contains("\"maint_sec\":0.900"), s)   // m reported separately
    assert(s.contains("\"m\":0.900"), s)           // still in the queries map
  }

  test("normalized_vs_prev: compact carries movers only, detail the full map") {
    val rs = Seq(q("q_a", 0.2, 0.01), q("q_b", 0.3, 0.01), q("q_c", 0.1, 0.01))
    val norm = Some(("BENCH_r12.json", 1.05,
      Map("q_a" -> 1.21, "q_b" -> 0.99, "q_c" -> 0.85)))
    val compact = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None,
      withRepTimes = false, canarySec = 0.08, normPrev = norm)
    assert(compact.contains("\"prev_round\":\"BENCH_r12.json\""))
    assert(compact.contains("\"canary_ratio\":1.05"))
    // only |ratio-1| > 10% movers survive into the bounded compact line
    assert(compact.contains("\"normalized_vs_prev\":{\"q_a\":1.21,\"q_c\":0.85}"),
      compact)
    assert(!compact.contains("\"q_b\":0.99"))
    val detail = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None,
      withRepTimes = true, canarySec = 0.08, normPrev = norm)
    assert(detail.contains("\"q_b\":0.99"), "detail must carry the full map")
    assert(compact.count(_ == '{') == compact.count(_ == '}'))
    assert(detail.count(_ == '{') == detail.count(_ == '}'))
    // absent archive → fields omitted entirely, record still parses
    val none = Bench.renderJson(rs, 7, 1.0, Seq(1, 1, 1), Seq(1, 1, 1),
      contended = false, noisy = Seq(), "/sf", 1, None)
    assert(!none.contains("normalized_vs_prev") && !none.contains("prev_round"))
  }

  test("canary_history rides both renderings; compact caps at the newest 8") {
    // VERDICT r15 item 4: three rounds of floor-drift adjudication were
    // PLANS.md archaeology — the record itself now carries the ledger.
    val rs = Seq(q("q1", 1.0, 0.1))
    val hist = (1 to 14).map(i => (i, 0.05 + i * 0.01))
    val compact = Bench.renderJson(rs, 7, 1.0, Seq(1), Seq(1),
      contended = false, noisy = Seq(), "/sf", 1, None,
      canarySec = 0.1, canaryHist = hist)
    assert(compact.contains("\"canary_history\":{"))
    assert(!compact.contains("\"r6\":") && compact.contains("\"r7\":") &&
      compact.contains("\"r14\":"), s"compact must cap at newest 8: $compact")
    val detail = Bench.renderJson(rs, 7, 1.0, Seq(1), Seq(1),
      contended = false, noisy = Seq(), "/sf", 1, None,
      withRepTimes = true, canarySec = 0.1, canaryHist = hist)
    assert(detail.contains("\"r1\":") && detail.contains("\"r14\":"))
    // empty history → field omitted, record still parses
    val none = Bench.renderJson(rs, 7, 1.0, Seq(1), Seq(1),
      contended = false, noisy = Seq(), "/sf", 1, None, canarySec = 0.1)
    assert(!none.contains("canary_history"))
  }

  test("normalizedVsPrev prefers the newest CLEAN archive over a newer contended one") {
    // VERDICT r15 item 4: r15's normalized map read 2.71x movers against
    // a 2.85x-contended r14 record — normalization must anchor on the
    // last CLEAN record (contended=false, noisy=[]); a contended archive
    // is only the fallback when no clean one exists.
    val dir = java.nio.file.Files.createTempDirectory("bench_arch").toFile
    def archive(n: Int, contended: Boolean, canary: Double): Unit =
      java.nio.file.Files.write(new java.io.File(dir, s"BENCH_r$n.json").toPath,
        (s"""{"parsed":{"canary_sec":$canary,"queries":{"qx":1.0},""" +
          s""""contended":$contended,"noisy":[]}}""").getBytes("UTF-8"))
    archive(1, contended = false, canary = 0.1)
    archive(2, contended = true, canary = 0.2)
    val rs = Seq(q("qx", 2.0, 0.1))
    val got = Bench.normalizedVsPrev(rs, canarySec = 0.1, dir = dir)
    assert(got.exists(_._1 == "BENCH_r1.json"),
      s"must normalize against the clean r1, not the contended r2: $got")
    // canary ratio 1.0 against r1 → qx ratio = 2.0
    assert(got.exists(g => math.abs(g._3("qx") - 2.0) < 1e-9))
    // no clean archive at all → newest contended is the fallback
    archive(1, contended = true, canary = 0.1)
    val fb = Bench.normalizedVsPrev(rs, canarySec = 0.1, dir = dir)
    assert(fb.exists(_._1 == "BENCH_r2.json"), s"fallback must be newest: $fb")
    // the ledger reads every archive, sorted by round
    val hist = Bench.canaryHistory(dir)
    assert(hist == Seq((1, 0.1), (2, 0.2)), s"history wrong: $hist")
  }

  test("compact record fits the driver's bounded tail capture (r9 parsed:null)") {
    // BENCH_r09 was clean but parsed:null — rep_times made the single JSON
    // line longer than the driver's 2000-char tail capture, which clipped
    // the record's HEAD. The compact rendering (the LAST stdout line) must
    // stay comfortably under that bound even at full headline width, and
    // must not carry rep_times at all.
    val rs = Bench.headline.map(n => q(n, 0.123, 0.045)) ++
      Seq(q("q_future_headroom_1", 1.234, 0.567), q("q_future_headroom_2", 9.876, 0.321),
        q("q_compact_incr", 0.6, 0.05), q("q_compact_bucketed", 0.5, 0.05),
        q("q_delete_range", 0.6, 0.05), q("q_stream_ingest", 1.2, 0.05),
        q("q_dedup_ingest", 2.9, 0.74))
    // worst case: a floor-shifted round flags EVERY query — the compact
    // rendering caps the emitted movers at the 8 largest displacements
    val norm = Some(("BENCH_r12.json", 1.08,
      rs.map(r => r.name -> 1.21).toMap))
    val compact = Bench.renderJson(rs, reps = 7, loadSec = 12.345,
      startLoad = Seq(0.11, 0.22, 0.33), endLoad = Seq(4.44, 5.55, 6.66),
      contended = false, noisy = Seq(), sfDir = "/root/testdata/sf0.1",
      attempt = 3, noCleanRun = Some(3), withRepTimes = false, normPrev = norm,
      canaryHist = (1 to 30).map(i => (i, 0.123))) // capped to 8 in compact
    assert(!compact.contains("rep_times"))
    assert(compact.length < 1900,
      s"compact record is ${compact.length} chars — would overflow the " +
        "driver's 2000-char tail capture")
    // the detail rendering keeps the full per-rep series for forensics
    val detail = Bench.renderJson(rs, 7, 12.345, Seq(0.1, 0.1, 0.1),
      Seq(0.1, 0.1, 0.1), contended = false, noisy = Seq(),
      "/sf", 1, None, withRepTimes = true)
    assert(detail.contains("\"rep_times\":{"))
    assert(detail.count(_ == '{') == detail.count(_ == '}'))
  }
}
