package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Randomized differential fuzzing inside `sbt test`: N random operator
  * pipelines (graft.fuzz.FuzzGen) executed on Spark and diffed against
  * DuckDB running the rendered SQL via tools/check.py — the exact
  * comparator the round driver's correctness gate uses.
  *
  * Replayable: the failure message and the info line carry the seed base;
  * `N=1 SEED=<seed> bash tools/run_fuzz.sh` replays any single failing
  * program (its full text is in the run dir's programs.txt). Tunables:
  * GRAFT_FUZZ_N (default 60), GRAFT_FUZZ_SEED (default 8000 — a fixed
  * base so CI runs are deterministic; bump it to explore new programs).
  */
class FuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def duckdbAvailable: Boolean =
    scala.util.Try(Seq("python3", "-c", "import duckdb").! == 0).getOrElse(false)

  private def runBatch(n: Int, seed0: Long,
                       base: Option[String] = None): Unit = {
    val out = java.nio.file.Files.createTempDirectory("graft_fuzz").toString
    val crashes = graft.fuzz.Fuzz.runPrograms(spark, sfDir, out, n, seed0, base)
    assert(crashes.isEmpty, s"Spark-side crashes (replay: N=1 SEED=<seed> " +
      s"bash tools/run_fuzz.sh):\n" +
      crashes.map { case (s, d, e) => s"  seed=$s $d\n    $e" }.mkString("\n"))
    val buf = new StringBuilder
    val code = Process(Seq("python3", "tools/check.py", sfDir, out),
      new java.io.File("/root/repo")) ! ProcessLogger(l => buf.append(l).append('\n'))
    val fails = buf.result().linesIterator.filter(_.startsWith("FAIL")).toVector
    val progs = scala.io.Source.fromFile(s"$out/programs.txt").getLines()
      .map { l => val Array(k, v) = l.split(": ", 2); k -> v }.toMap
    assert(code == 0 && fails.isEmpty,
      s"differential mismatches (seeds $seed0..${seed0 + n - 1}; dir $out):\n" +
        fails.map { f =>
          val name = f.split("[ :]")(1)
          s"  $f\n    program: ${progs.getOrElse(name, "?")}"
        }.mkString("\n"))
  }

  test("random operator pipelines match DuckDB (differential fuzz)") {
    assume(duckdbAvailable, "python3+duckdb oracle not available")
    val n = sys.env.get("GRAFT_FUZZ_N").map(_.toInt).getOrElse(60)
    val seed0 = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(8000L)
    info(s"fuzzing $n programs from seed $seed0 " +
      s"(replay one: N=1 SEED=<seed> bash tools/run_fuzz.sh)")
    runBatch(n, seed0)
  }

  test("pinned fuzz regressions: keyless w_dev_ref on an all-NULL frame") {
    // Seeds 8026/8059 found the keyless windowAgg scan emitting NULL
    // w_dev_ref for a frame with no non-null values, where the keyed
    // path's sqrt(greatest(refVar, 0.0)) yields 0.0 (greatest skips
    // NULLs). Both compose keyless windowAgg after NULL injection.
    assume(duckdbAvailable, "python3+duckdb oracle not available")
    runBatch(1, 8026L, Some("events"))
    runBatch(1, 8059L, Some("events"))
  }

  test("pinned fuzz regression: reverse of a non-dense series must renumber") {
    // Seeds 8047/8058 (equiJoin/span → reverse → gridAgg) caught
    // Series.reverse's cnt-1-pos relabel emitting NEGATIVE positions for
    // non-dense input pos, which leaked into grid bucket ids. reverse now
    // renumbers to dense reversed ordinals (the reference's semantics).
    assume(duckdbAvailable, "python3+duckdb oracle not available")
    runBatch(1, 8047L, Some("events"))
    runBatch(1, 8058L, Some("events"))
  }

  test("pinned fuzz regression: keyless extrema leaked its __d helper column") {
    // Seed 5006 (keys=<none> | extrema | thin) caught Analytics.extrema's
    // keyless path dropping __before/__after/__fp but not the internal
    // diff's __d sign column — a schema divergence from the keyed path.
    assume(duckdbAvailable, "python3+duckdb oracle not available")
    runBatch(1, 5006L, Some("events"))
  }
}
