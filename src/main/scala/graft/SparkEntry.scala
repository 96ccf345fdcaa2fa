package graft

import graft.agg.Aggs
import graft.analytics.Analytics
import graft.dedup.Dedup
import graft.io.Tables
import graft.join.Align
import graft.series.Series
import graft.sim.Similarity
import graft.text.TextOps
import graft.window.Moving
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract: the operator catalog. Each `queries` entry exercises
  * one operator family from SURVEY.md §2 (or the training-data pipeline
  * extensions) on the driver's parquet tables; `oracleSql` is the DuckDB
  * equivalent the driver diffs against. Column names/aliases match between
  * the two by construction (the driver sorts columns by name and hashes
  * values). Double-valued outputs are cast to float on both sides so that
  * summation-order ulp differences between engines cannot flip the hash.
  */
object SparkEntry {

  private def li(s: SparkSession, dir: String) = Tables.read(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.read(s, dir, "orders")
  private def cust(s: SparkSession, dir: String) = Tables.read(s, dir, "customer")
  private def docs(s: SparkSession, dir: String) = Tables.read(s, dir, "documents")
  private def emb(s: SparkSession, dir: String) = Tables.read(s, dir, "embeddings")

  /** events as a per-type series: pos = rank within event_type by (ts, event_id). */
  private def evSeries(s: SparkSession, dir: String): DataFrame =
    Series.attachPos(Tables.read(s, dir, "events"),
      Seq("event_type"), Seq(col("ts"), col("event_id")))

  /** SQL fragment mirroring evSeries's pos. */
  private val evPosSql =
    "SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS pos FROM events"

  /** Double outputs are cast to float (REAL in the oracle SQL): both engines
    * compute in double with summation orders that may differ in the last
    * bits; the float cast collapses ulp-level divergence to identical bits,
    * where decimal rounding would flip at ties (e.g. x.xxx25).
    */
  private def fl(c: Column): Column = c.cast("float")


  /** Flagship query on sf=0.001; driver smoke-checks rows>0. TPC-H Q1. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- hash aggregation (cs_hash_* family, func.c:5113-5447) ----
    "q1_agg" -> ((s, dir) => {
      li(s, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          fl(sum(col("l_quantity"))).as("sum_qty"),
          fl(sum(col("l_extendedprice"))).as("sum_base_price"),
          fl(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
          fl(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge"),
          fl(avg(col("l_quantity"))).as("avg_qty"),
          fl(avg(col("l_extendedprice"))).as("avg_price"),
          fl(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "q_hash_multi" -> ((s, dir) => {
      // 3-key hash agg — BASELINE.md row 10 shape.
      li(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"), year(col("l_shipdate")).as("ship_year"))
        .agg(
          count(lit(1)).as("n"),
          fl(sum(col("l_extendedprice"))).as("sum_price"),
          fl(avg(col("l_discount"))).as("avg_disc"),
          fl(min(col("l_quantity"))).as("min_qty"),
          fl(max(col("l_quantity"))).as("max_qty"))
    }),
    "q_hash_dup_count" -> ((s, dir) =>
      Aggs.hashDupCount(ord(s, dir), "o_custkey", Seq("o_orderpriority"), 3L)),

    // ---- grand aggregates (cs_count/min/max/sum/avg/var/dev, §2.4) ----
    "q_grand_agg" -> ((s, dir) => {
      li(s, dir).agg(
        count(lit(1)).as("cnt"),
        fl(sum(col("l_quantity"))).as("sum_q"),
        fl(min(col("l_extendedprice"))).as("min_p"),
        fl(max(col("l_extendedprice"))).as("max_p"),
        fl(avg(col("l_extendedprice"))).as("avg_p"),
        fl(var_pop(col("l_quantity"))).as("var_q"),
        fl(stddev_pop(col("l_quantity"))).as("dev_q"))
    }),
    "q_scalar_agg" -> ((s, dir) => {
      // two-series scalar aggregates: wsum/wavg/cov/corr (func.c:1502-1610)
      li(s, dir).agg(
        fl(Aggs.wsum(col("l_quantity"), col("l_extendedprice"))).as("wsum"),
        fl(Aggs.wavg(col("l_quantity"), col("l_extendedprice"))).as("wavg"),
        fl(covar_pop(col("l_quantity"), col("l_extendedprice"))).as("cov"),
        fl(corr(col("l_quantity"), col("l_extendedprice"))).as("corr"))
    }),
    "q_vwap" -> ((s, dir) => {
      // per-key VWAP — BASELINE.md rows 4/5: cs_wavg(Volume, Close) per symbol
      li(s, dir).groupBy(col("l_suppkey"))
        .agg(fl(Aggs.wavg(col("l_quantity"), col("l_extendedprice"))).as("vwap"))
    }),
    "q_filter_count" -> ((s, dir) =>
      // BASELINE.md row 9: cs_count((Close > Open*1.1)?)
      li(s, dir).filter(col("l_extendedprice") > col("l_quantity") * lit(1000.0))
        .agg(count(lit(1)).as("n"))),
    "q_prd" -> ((s, dir) =>
      // product aggregate over a small positive series (cs_prd)
      evSeries(s, dir).filter(col("event_type") === "purchase" && col("pos") < 20)
        .agg(fl(Aggs.prd("value")).as("prd"))),
    "q_median" -> ((s, dir) =>
      li(s, dir).agg(
        fl(percentile(col("l_quantity"), lit(0.5))).as("med_q"),
        fl(percentile(col("l_extendedprice"), lit(0.9))).as("p90_price"))),
    "q_all_any" -> ((s, dir) =>
      // bitwise AND/OR reduction — cs_all/cs_any (func.c:1446-1456)
      ord(s, dir).agg(
        bit_and(col("o_custkey")).as("all_bits"),
        bit_or(col("o_custkey")).as("any_bits"))),

    // ---- element-wise scalar ops (§2.3) ----
    "q_arith" -> ((s, dir) =>
      li(s, dir).filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          fl(col("l_extendedprice") + col("l_quantity")).as("add"),
          fl(col("l_extendedprice") - col("l_quantity")).as("sub"),
          fl(col("l_extendedprice") * col("l_discount")).as("mul"),
          fl(col("l_extendedprice") / col("l_quantity")).as("div"),
          pmod(col("l_orderkey"), lit(7)).as("mod"),
          fl(pow(col("l_quantity"), lit(2.0))).as("pw"))),
    "q_math" -> ((s, dir) =>
      li(s, dir).filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          fl(abs(-col("l_quantity"))).as("abs_v"),
          fl(sqrt(col("l_extendedprice"))).as("sqrt_v"),
          fl(log(col("l_extendedprice"))).as("ln_v"),
          fl(exp(col("l_discount"))).as("exp_v"),
          fl(sin(col("l_quantity"))).as("sin_v"),
          floor(col("l_extendedprice")).as("floor_v"),
          ceil(col("l_extendedprice")).as("ceil_v"),
          fl(greatest(col("l_quantity"), col("l_discount") * 100)).as("maxof"),
          fl(least(col("l_quantity"), col("l_discount") * 100)).as("minof"))),
    "q_datetime" -> ((s, dir) =>
      // cs_year/month/mday/wday/hour/minute/second/week/quarter (§2.3)
      ord(s, dir).filter(col("o_orderkey") < 200)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("mday"),
          dayofweek(col("o_orderdate")).as("wday"),
          hour(col("o_orderdate")).as("hr"),
          minute(col("o_orderdate")).as("mi"),
          second(col("o_orderdate")).as("sec"),
          weekofyear(col("o_orderdate")).as("wk"),
          quarter(col("o_orderdate")).as("qtr"))),
    "q_cast" -> ((s, dir) =>
      li(s, dir).filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("q_int"),
          col("l_quantity").cast("string").as("q_str"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          to_date(col("l_shipdate")).as("ship_day"))),
    "q_iif" -> ((s, dir) =>
      li(s, dir).filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_discount") > 0.05, col("l_extendedprice"))
            .otherwise(-col("l_extendedprice")).as("signed_price"))),
    "q_like" -> ((s, dir) =>
      Tables.read(s, dir, "part")
        .filter(col("p_name").like("%gold%") || col("p_type").like("STANDARD%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))),

    // ---- positional series ops (§2.2) ----
    "q_span" -> ((s, dir) =>
      Series.span(evSeries(s, dir), Seq("event_type"), 10, 19)
        .select(col("event_type"), col("pos"), col("event_id"), fl(col("value")).as("value"))),
    "q_thin" -> ((s, dir) =>
      Series.thin(evSeries(s, dir), 0, 100)
        .select(col("event_type"), col("pos"), col("event_id"))),
    "q_head_tail" -> ((s, dir) => {
      val se = evSeries(s, dir)
      Series.head(se, 5).withColumn("which", lit("head"))
        .unionByName(Series.tail(se, Seq("event_type"), 5).withColumn("which", lit("tail")))
        .select(col("event_type"), col("which"), col("pos"), col("event_id"))
    }),
    "q_reverse" -> ((s, dir) =>
      Series.reverse(evSeries(s, dir), Seq("event_type"))
        .filter(col("pos") < 5)
        .select(col("event_type"), col("pos"), col("event_id"))),
    "q_filter_pos" -> ((s, dir) =>
      evSeries(s, dir).filter(col("value") > 450).select(col("event_type"), col("pos"))),
    "q_unique" -> ((s, dir) =>
      // adjacent-duplicate collapse on a coarse value (cs_unique)
      Series.uniqueAdjacent(
        evSeries(s, dir).withColumn("bucket", floor(col("value") / 100)),
        Seq("event_type"), "bucket")
        .select(col("event_type"), col("pos"), col("bucket"))),
    "q_gather" -> ((s, dir) => {
      // cs_map: project value at the positions where another cond held
      val se = evSeries(s, dir)
      val pos = se.filter(col("value") > 480).select(col("event_type"), col("pos"))
      Series.gather(se, pos, Seq("event_type"))
        .select(col("event_type"), col("pos"), col("event_id"), fl(col("value")).as("value"))
    }),

    // ---- grouped / grid / cumulative / moving (§2.4-2.5) ----
    "q_group_agg" -> ((s, dir) =>
      Aggs.groupAgg(
        evSeries(s, dir).withColumn("dir", (col("value") > 250).cast("int")),
        Seq("event_type"), "dir", "value")
        .select(col("event_type"), col("run_id"), col("group_val"),
          col("grp_count"), fl(col("grp_sum")).as("grp_sum"),
          fl(col("grp_min")).as("grp_min"), fl(col("grp_max")).as("grp_max"),
          fl(col("grp_avg")).as("grp_avg"),
          fl(col("grp_first")).as("grp_first"), fl(col("grp_last")).as("grp_last"))),
    "q_grid_agg" -> ((s, dir) =>
      Aggs.gridAgg(evSeries(s, dir), Seq("event_type"), "value", 100)
        .select(col("event_type"), col("grid"), col("grid_count"),
          fl(col("grid_sum")).as("grid_sum"), fl(col("grid_avg")).as("grid_avg"),
          fl(col("grid_min")).as("grid_min"), fl(col("grid_max")).as("grid_max"))),
    "q_cum_agg" -> ((s, dir) =>
      Aggs.cumAgg(evSeries(s, dir), Seq("event_type"), "value")
        .filter(col("pos") < 50)
        .select(col("event_type"), col("pos"),
          fl(col("cum_sum")).as("cum_sum"), fl(col("cum_avg")).as("cum_avg"),
          fl(col("cum_min")).as("cum_min"), fl(col("cum_max")).as("cum_max"),
          col("cum_count"))),
    "q_window_agg" -> ((s, dir) =>
      Moving.windowAgg(evSeries(s, dir), Seq("event_type"), "value", 10)
        .filter(col("pos") < 100)
        .select(col("event_type"), col("pos"),
          fl(col("w_sum")).as("w_sum"), fl(col("w_avg")).as("w_avg"),
          fl(col("w_min")).as("w_min"), fl(col("w_max")).as("w_max"),
          fl(col("w_var")).as("w_var"))),

    // ---- order analytics (§2.6, §2.8) ----
    "q_topk" -> ((s, dir) =>
      Aggs.topK(ord(s, dir), "o_totalprice", 25, desc = true, "o_orderkey")
        .select(col("o_orderkey"), fl(col("o_totalprice")).as("o_totalprice"))),
    "q_rank" -> ((s, dir) =>
      Moving.rank(evSeries(s, dir).filter(col("pos") < 50), Seq("event_type"), "value")
        .select(col("event_type"), col("pos"), col("rnk"), col("dense_rnk"))),
    "q_quantile" -> ((s, dir) =>
      Analytics.quantile(li(s, dir), "l_extendedprice", 4)
        .select(col("q_idx"), fl(col("q_value")).as("q_value"))),
    "q_diff" -> ((s, dir) =>
      Analytics.diff(evSeries(s, dir), Seq("event_type"), "value")
        .filter(col("pos") < 100)
        .select(col("event_type"), col("pos"), fl(col("diff")).as("diff"))),
    "q_histogram" -> ((s, dir) =>
      Aggs.histogram(evSeries(s, dir), "value", 0.0, 500.0, 10)),
    "q_norm" -> ((s, dir) =>
      Analytics.norm(evSeries(s, dir), Seq("event_type"), "value")
        .filter(col("pos") < 50)
        .select(col("event_type"), col("pos"), col("norm").cast("float").as("norm"))),

    // ---- alignment joins (§2.7) ----
    "q_join" -> ((s, dir) => {
      // relational equi-join path: revenue per market segment
      val o = ord(s, dir)
      val c = cust(s, dir)
      li(s, dir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(fl(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q_asof" -> ((s, dir) => {
      // as-of join: for each purchase, the last preceding signup value per user
      val ev = Tables.read(s, dir, "events")
      val l = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val r = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value"))
      Align.asofJoin(l, r, Seq("user_id"), "ts", "value", "asof_value")
        .select(col("user_id"), col("event_id"),
          fl(col("value")).as("value"), fl(col("asof_value")).as("asof_value"))
    }),
    "q_stretch0" -> ((s, dir) => {
      // exact-ts gap fill: error values aligned to click timestamps, -1 filler
      val ev = Tables.read(s, dir, "events")
      val l = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("value"))
      Align.stretch0(l, r, Seq("user_id"), "ts", "value", lit(-1.0), "filled")
        .select(col("user_id"), col("event_id"), fl(col("filled")).as("filled"))
    }),
    "q_union_merge" -> ((s, dir) => {
      val ev = Tables.read(s, dir, "events")
      Align.unionMerge(
          ev.filter(col("event_type") === "click"),
          ev.filter(col("event_type") === "view"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"), fl(sum(col("value"))).as("sv"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS REAL) AS sum_qty,
         CAST(sum(l_extendedprice) AS REAL) AS sum_base_price,
         CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS sum_disc_price,
         CAST(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS REAL) AS sum_charge,
         CAST(avg(l_quantity) AS REAL) AS avg_qty,
         CAST(avg(l_extendedprice) AS REAL) AS avg_price,
         CAST(avg(l_discount) AS REAL) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",
    "q_hash_multi" ->
      """SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
         count(*) AS n, CAST(sum(l_extendedprice) AS REAL) AS sum_price,
         CAST(avg(l_discount) AS REAL) AS avg_disc,
         CAST(min(l_quantity) AS REAL) AS min_qty, CAST(max(l_quantity) AS REAL) AS max_qty
         FROM lineitem GROUP BY 1, 2, 3""",
    "q_hash_dup_count" ->
      """SELECT o_orderpriority, count(*) AS dup_count FROM (
           SELECT o_orderpriority, o_custkey, count(*) AS occ
           FROM orders GROUP BY 1, 2 HAVING count(*) >= 3)
         GROUP BY o_orderpriority""",
    "q_grand_agg" ->
      """SELECT count(*) AS cnt, CAST(sum(l_quantity) AS REAL) AS sum_q,
         CAST(min(l_extendedprice) AS REAL) AS min_p, CAST(max(l_extendedprice) AS REAL) AS max_p,
         CAST(avg(l_extendedprice) AS REAL) AS avg_p,
         CAST(var_pop(l_quantity) AS REAL) AS var_q, CAST(stddev_pop(l_quantity) AS REAL) AS dev_q
         FROM lineitem""",
    "q_scalar_agg" ->
      """SELECT CAST(sum(l_quantity * l_extendedprice) AS REAL) AS wsum,
         CAST(sum(l_quantity * l_extendedprice) / sum(l_quantity) AS REAL) AS wavg,
         CAST(covar_pop(l_quantity, l_extendedprice) AS REAL) AS cov,
         CAST(corr(l_quantity, l_extendedprice) AS REAL) AS corr
         FROM lineitem""",
    "q_vwap" ->
      """SELECT l_suppkey,
         CAST(sum(l_quantity * l_extendedprice) / sum(l_quantity) AS REAL) AS vwap
         FROM lineitem GROUP BY l_suppkey""",
    "q_filter_count" ->
      "SELECT count(*) AS n FROM lineitem WHERE l_extendedprice > l_quantity * 1000.0",
    "q_prd" ->
      s"""SELECT CAST(product("value") AS REAL) AS prd FROM ($evPosSql)
         WHERE event_type = 'purchase' AND pos < 20""",
    "q_median" ->
      """SELECT CAST(quantile_cont(l_quantity, 0.5) AS REAL) AS med_q,
         CAST(quantile_cont(l_extendedprice, 0.9) AS REAL) AS p90_price FROM lineitem""",
    "q_all_any" ->
      "SELECT bit_and(o_custkey) AS all_bits, bit_or(o_custkey) AS any_bits FROM orders",
    "q_arith" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(l_extendedprice + l_quantity AS REAL) AS add,
         CAST(l_extendedprice - l_quantity AS REAL) AS sub,
         CAST(l_extendedprice * l_discount AS REAL) AS mul,
         CAST(l_extendedprice / l_quantity AS REAL) AS div,
         l_orderkey % 7 AS mod,
         CAST(pow(l_quantity, 2.0) AS REAL) AS pw
         FROM lineitem WHERE l_orderkey < 100""",
    "q_math" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(abs(-l_quantity) AS REAL) AS abs_v, CAST(sqrt(l_extendedprice) AS REAL) AS sqrt_v,
         CAST(ln(l_extendedprice) AS REAL) AS ln_v, CAST(exp(l_discount) AS REAL) AS exp_v,
         CAST(sin(l_quantity) AS REAL) AS sin_v,
         floor(l_extendedprice) AS floor_v, ceil(l_extendedprice) AS ceil_v,
         CAST(greatest(l_quantity, l_discount * 100) AS REAL) AS maxof,
         CAST(least(l_quantity, l_discount * 100) AS REAL) AS minof
         FROM lineitem WHERE l_orderkey < 100""",
    "q_datetime" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS mo,
         day(o_orderdate) AS mday, dayofweek(o_orderdate) + 1 AS wday,
         hour(o_orderdate) AS hr, minute(o_orderdate) AS mi,
         CAST(second(o_orderdate) AS INT) AS sec,
         weekofyear(o_orderdate) AS wk, quarter(o_orderdate) AS qtr
         FROM orders WHERE o_orderkey < 200""",
    "q_cast" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(trunc(l_quantity) AS INT) AS q_int,
         CAST(l_quantity AS VARCHAR) AS q_str,
         CAST(l_linenumber AS DOUBLE) AS ln_dbl,
         CAST(l_shipdate AS DATE) AS ship_day
         FROM lineitem WHERE l_orderkey < 100""",
    "q_iif" ->
      """SELECT l_orderkey, l_linenumber,
         CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE -l_extendedprice END AS signed_price
         FROM lineitem WHERE l_orderkey < 100""",
    "q_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE p_name LIKE '%gold%' OR p_type LIKE 'STANDARD%'""",
    "q_span" ->
      s"""SELECT event_type, pos, event_id, CAST("value" AS REAL) AS value
         FROM ($evPosSql) WHERE pos BETWEEN 10 AND 19""",
    "q_thin" ->
      s"SELECT event_type, pos, event_id FROM ($evPosSql) WHERE pos % 100 = 0",
    "q_head_tail" ->
      s"""WITH se AS (SELECT *, count(*) OVER (PARTITION BY event_type) AS cnt FROM ($evPosSql))
         SELECT event_type, 'head' AS which, pos, event_id FROM se WHERE pos < 5
         UNION ALL
         SELECT event_type, 'tail' AS which, pos, event_id FROM se WHERE pos >= cnt - 5""",
    "q_reverse" ->
      s"""SELECT event_type, cnt - 1 - pos AS pos, event_id
         FROM (SELECT *, count(*) OVER (PARTITION BY event_type) AS cnt FROM ($evPosSql))
         WHERE cnt - 1 - pos < 5""",
    "q_filter_pos" ->
      s"""SELECT event_type, pos FROM ($evPosSql) WHERE "value" > 450""",
    "q_unique" ->
      s"""SELECT event_type, pos, bucket FROM (
           SELECT event_type, pos, bucket,
             lag(bucket) OVER (PARTITION BY event_type ORDER BY pos) AS prev
           FROM (SELECT *, CAST(floor("value" / 100) AS BIGINT) AS bucket FROM ($evPosSql)))
         WHERE prev IS NULL OR prev <> bucket""",
    "q_gather" ->
      s"""SELECT event_type, pos, event_id, CAST("value" AS REAL) AS value
         FROM ($evPosSql) WHERE "value" > 480""",
    "q_group_agg" ->
      s"""WITH d AS (SELECT event_type, pos, "value",
             CAST(("value" > 250) AS INT) AS dir FROM ($evPosSql)),
         runs AS (SELECT *, sum(CASE WHEN prev IS NULL OR prev <> dir THEN 1 ELSE 0 END)
             OVER (PARTITION BY event_type ORDER BY pos) AS run_id
           FROM (SELECT *, lag(dir) OVER (PARTITION BY event_type ORDER BY pos) AS prev FROM d))
         SELECT event_type, run_id, CAST(first(dir ORDER BY pos) AS INT) AS group_val,
           count(*) AS grp_count, CAST(sum("value") AS REAL) AS grp_sum,
           CAST(min("value") AS REAL) AS grp_min, CAST(max("value") AS REAL) AS grp_max,
           CAST(avg("value") AS REAL) AS grp_avg,
           CAST(first("value" ORDER BY pos) AS REAL) AS grp_first,
           CAST(last("value" ORDER BY pos) AS REAL) AS grp_last
         FROM runs GROUP BY event_type, run_id""",
    "q_grid_agg" ->
      s"""SELECT event_type, CAST(floor(pos / 100) AS BIGINT) AS grid,
         count(*) AS grid_count, CAST(sum("value") AS REAL) AS grid_sum,
         CAST(avg("value") AS REAL) AS grid_avg,
         CAST(min("value") AS REAL) AS grid_min, CAST(max("value") AS REAL) AS grid_max
         FROM ($evPosSql) GROUP BY 1, 2""",
    "q_cum_agg" ->
      s"""SELECT event_type, pos,
         CAST(sum("value") OVER w AS REAL) AS cum_sum, CAST(avg("value") OVER w AS REAL) AS cum_avg,
         CAST(min("value") OVER w AS REAL) AS cum_min, CAST(max("value") OVER w AS REAL) AS cum_max,
         count(*) OVER w AS cum_count
         FROM ($evPosSql) WINDOW w AS (PARTITION BY event_type ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         QUALIFY pos < 50""",
    "q_window_agg" ->
      s"""SELECT event_type, pos,
         CAST(sum("value") OVER w AS REAL) AS w_sum, CAST(avg("value") OVER w AS REAL) AS w_avg,
         CAST(min("value") OVER w AS REAL) AS w_min, CAST(max("value") OVER w AS REAL) AS w_max,
         CAST(var_pop("value") OVER w AS REAL) AS w_var
         FROM ($evPosSql) WINDOW w AS (PARTITION BY event_type ORDER BY pos
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
         QUALIFY pos < 100""",
    "q_topk" ->
      """SELECT o_orderkey, CAST(o_totalprice AS REAL) AS o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""",
    "q_rank" ->
      s"""SELECT event_type, pos,
         rank() OVER (PARTITION BY event_type ORDER BY "value") AS rnk,
         dense_rank() OVER (PARTITION BY event_type ORDER BY "value") AS dense_rnk
         FROM ($evPosSql) WHERE pos < 50""",
    "q_quantile" ->
      """WITH qv AS (SELECT quantile_cont(l_extendedprice, [0.0, 0.25, 0.5, 0.75, 1.0]) AS qs
                     FROM lineitem)
         SELECT q_idx, CAST(qs[q_idx + 1] AS REAL) AS q_value
         FROM qv, (SELECT unnest(generate_series(0, 4)) AS q_idx)""",
    "q_diff" ->
      s"""SELECT event_type, pos,
         CAST(coalesce("value" - lag("value") OVER (PARTITION BY event_type ORDER BY pos), 0) AS REAL) AS diff
         FROM ($evPosSql) QUALIFY pos < 100""",
    "q_histogram" ->
      s"""SELECT CAST(floor(("value" - 0.0) / 50.0) AS BIGINT) AS bin, count(*) AS bin_count
         FROM events WHERE "value" >= 0.0 AND "value" < 500.0 GROUP BY 1""",
    "q_norm" ->
      s"""SELECT event_type, pos,
         CAST("value" / sqrt(sum("value" * "value") OVER (PARTITION BY event_type)) AS REAL) AS norm
         FROM ($evPosSql) QUALIFY pos < 50""",
    "q_join" ->
      """SELECT c_mktsegment,
         CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue, count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "q_asof" ->
      """SELECT l.user_id, l.event_id, CAST(l."value" AS REAL) AS value,
         CAST(r."value" AS REAL) AS asof_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') l
         ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
         ON l.user_id = r.user_id AND l.ts >= r.ts""",
    "q_stretch0" ->
      """SELECT l.user_id, l.event_id,
         CAST(coalesce(r."value", -1.0) AS REAL) AS filled
         FROM (SELECT * FROM events WHERE event_type = 'click') l
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
         ON l.user_id = r.user_id AND l.ts = r.ts""",
    "q_union_merge" ->
      """SELECT event_type, count(*) AS n, CAST(sum("value") AS REAL) AS sv
         FROM (SELECT * FROM events WHERE event_type = 'click'
               UNION ALL SELECT * FROM events WHERE event_type = 'view')
         GROUP BY event_type"""
  )
}
