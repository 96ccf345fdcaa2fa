package graft

/** Generates the machine-derived sections of USER_GUIDE.md from the code
  * itself, so the doc cannot drift from the registry:
  *
  *  - `registry`: one markdown table row per registered cs_* SQL function
  *    (name + its ExpressionInfo usage string), straight from
  *    [[graft.sqlext.GraftFunctions.all]];
  *  - `queries`: one row per gated query in [[SparkEntry.queries]], with
  *    its verification mode (DuckDB-oracle vs rows-only).
  *
  * Run via `bash tools/gen_guide.sh`, which splices the output between
  * the GENERATED markers in USER_GUIDE.md. No SparkSession is started —
  * both tables are static metadata.
  */
object Guide {
  private def esc(s: String): String =
    s.replace("|", "\\|").replace("\n", " ")

  def main(args: Array[String]): Unit = args.headOption.getOrElse("registry") match {
    case "registry" =>
      val all = graft.sqlext.GraftFunctions.all
      println(s"${all.size} registered names. Everything below is a NATIVE")
      println("Catalyst expression (whole-stage codegen, no UDF serialization).")
      println()
      println("| SQL name | usage |")
      println("|---|---|")
      all.sortBy(_._1).foreach { case (n, _, u) =>
        println(s"| `$n` | ${esc(u.stripPrefix(n))} |")
      }
    case "queries" =>
      val os = SparkEntry.oracleSql.keySet
      val qs = SparkEntry.queries.keys.toSeq.sorted
      println(s"${qs.size} gated queries (graft.Verify dumps each to parquet;")
      println("the driver replays the oracle SQL in DuckDB and diffs rows,")
      println("schema, and value hashes).")
      println()
      println("| gate query | verification |")
      println("|---|---|")
      qs.foreach { q =>
        val mode = if (os(q)) "DuckDB oracle (rows+schema+hash)" else "rows-only"
        println(s"| $q | $mode |")
      }
    case other =>
      System.err.println(s"unknown mode '$other' (registry|queries)")
      sys.exit(2)
  }
}
