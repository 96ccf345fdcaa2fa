package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Union
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** UnionDisjointFilterCollapse: a UNION ALL of disjoint literal slices of
  * the same source must optimize to ONE IN-filtered scan (the reference's
  * Quote_concat-then-aggregate idiom, user_guide example.sql:50), and must
  * NOT fire when the rewrite would change results — duplicate literals
  * (multiset multiplicity), extra predicates, or different sources.
  */
class UnionCollapseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def ev = graft.io.Tables.read(spark, sfDir, "events")

  private def unions(df: DataFrame): Seq[Union] =
    df.queryExecution.optimizedPlan.collect { case u: Union => u }

  private def slices(types: Seq[String]): DataFrame =
    types.map(t => ev.filter(col("event_type") === t).select(col("value")))
      .reduce(graft.join.Align.unionMerge)

  test("disjoint literal slices collapse to one scan") {
    val df = slices(Seq("view", "click", "purchase", "signup"))
    assert(unions(df).isEmpty, "union of disjoint slices must collapse")
    assert(df.queryExecution.optimizedPlan.collectLeaves().size == 1,
      "exactly one source scan after the rewrite")
    // and the collapsed plan computes the same multiset
    val direct = ev.filter(
      col("event_type").isin("view", "click", "purchase", "signup"))
    assert(df.count() == direct.count())
    val a = df.agg(sum("value")).head.getDouble(0)
    val b = direct.agg(sum("value")).head.getDouble(0)
    assert(math.abs(a - b) < 1e-6 * math.abs(b))
  }

  test("arms wrapped in identical round-robin Repartition still collapse") {
    // Tables.read's undersized-source re-split puts a Repartition node on
    // top of every arm at sf0.1-class sizes — the collapse must peel it
    // (row-preserving) and re-apply ONE node on the merged scan, or the
    // single-scan property silently vanishes exactly where the data is
    // big enough to matter (caught by the sf0.1 budget gate on
    // q_concat_ranges, whose in-query assert counted 3 scan leaves)
    val arms = Seq("view", "click", "purchase").map(t =>
      ev.filter(col("event_type") === t).select(col("value")).repartition(4))
    val df = arms.reduce(graft.join.Align.unionMerge)
    assert(unions(df).isEmpty, "repartitioned disjoint arms must collapse")
    assert(df.queryExecution.optimizedPlan.collectLeaves().size == 1,
      "exactly one source scan after the rewrite")
    val direct = ev.filter(col("event_type").isin("view", "click", "purchase"))
    assert(df.count() == direct.count())
    // arms with DIFFERENT partition counts stay un-collapsed (content
    // would still match, but the conservative gate mirrors the shape gate)
    val mixed = Seq(
      ev.filter(col("event_type") === "view").select(col("value")).repartition(4),
      ev.filter(col("event_type") === "click").select(col("value")).repartition(8)
    ).reduce(graft.join.Align.unionMerge)
    assert(unions(mixed).nonEmpty, "mismatched repartition params must not merge")
  }

  test("signed-zero float arms do NOT collapse (evaluation treats -0.0 = 0.0)") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    // the interpreted ORDERING says -0.0 < 0.0 (distinct points) but
    // comparison EVALUATION says they are equal — a 0.0 row satisfies BOTH
    // arms, so a collapse to IN(-0.0, 0.0) would halve its multiplicity.
    // (A parquet source, not a LocalRelation — ConvertToLocalRelation
    // evaluates local filters away before this rule could ever see them.)
    val df = ev.filter(col("value") === lit(-0.0)).select(col("value"))
      .unionByName(ev.filter(col("value") === lit(0.0)).select(col("value")))
    assert(unions(df).nonEmpty, "signed-zero arms overlap; must not collapse")
    // sanity: genuinely-disjoint double points still collapse
    val ok = ev.filter(col("value") === lit(1.5)).select(col("value"))
      .unionByName(ev.filter(col("value") === lit(2.5)).select(col("value")))
    assert(unions(ok).isEmpty)
    assert(ok.queryExecution.optimizedPlan.collectLeaves().size == 1)
  }

  test("duplicate literals do NOT collapse (multiset multiplicity)") {
    val df = slices(Seq("view", "view"))
    assert(unions(df).nonEmpty, "a duplicated arm doubles rows; IN would not")
    assert(df.count() ==
      2 * ev.filter(col("event_type") === "view").count())
  }

  test("arm-varying extra predicates collapse via the OR fallback") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    // slices on event_type are disjoint, so the union is still one scan —
    // the extra predicate rides along inside its own disjunct
    val a = ev.filter(col("event_type") === "view").select(col("value"))
    val b = ev.filter(col("event_type") === "click" && col("value") > 100)
      .select(col("value"))
    val df = a.unionByName(b)
    assert(unions(df).isEmpty)
    assert(df.queryExecution.optimizedPlan.collectLeaves().size == 1)
    val direct = ev.filter(
      col("event_type") === "view" ||
        (col("event_type") === "click" && col("value") > 100)).count()
    assert(df.count() == direct)
  }

  test("no disjoint key at all does NOT collapse") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    // both arms keep the same type; only the value ranges differ AND
    // overlap — there is no column slicing the arms apart
    val a = ev.filter(col("event_type") === "view" && col("value") > 50)
      .select(col("value"))
    val b = ev.filter(col("event_type") === "view" && col("value") < 100)
      .select(col("value"))
    assert(unions(a.unionByName(b)).nonEmpty)
  }

  test("arms over different sources do NOT collapse") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    val li = graft.io.Tables.read(spark, sfDir, "lineitem")
    val a = ev.filter(col("event_type") === "view")
      .select(col("value").cast("double").as("v"))
    val b = li.filter(col("l_returnflag") === "A")
      .select(col("l_quantity").cast("double").as("v"))
    assert(unions(a.unionByName(b)).nonEmpty)
  }

  test("disjoint ts-range slices collapse to one scan (TABLE_concat of periods)") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    // three half-open week slices of the events series — the reference's
    // TABLE_concat-of-period-slices idiom (imcs--1.1.sql:246-259)
    val t0 = ev.agg(min("ts")).head.getLong(0)
    val day = 86_400_000_000_000L
    val arms = Seq(
      ev.filter(col("ts") < t0 + 7 * day),
      ev.filter(col("ts") >= t0 + 7 * day && col("ts") < t0 + 14 * day),
      ev.filter(col("ts") >= t0 + 14 * day && col("ts") < t0 + 21 * day))
      .map(_.select(col("ts"), col("value")))
    val df = arms.reduce(_ unionByName _)
    assert(unions(df).isEmpty, "disjoint half-open ranges must collapse")
    assert(df.queryExecution.optimizedPlan.collectLeaves().size == 1)
    assert(df.count() == ev.filter(col("ts") < t0 + 21 * day).count())
  }

  test("overlapping or touching-inclusive ranges do NOT collapse") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    val t0 = ev.agg(min("ts")).head.getLong(0)
    val day = 86_400_000_000_000L
    def slice(c: org.apache.spark.sql.Column) = ev.filter(c).select(col("ts"))
    // [t0, t0+7d] then [t0+7d, ...): both ends inclusive at the boundary —
    // a row AT the boundary belongs to both arms
    val touching = slice(col("ts") <= t0 + 7 * day)
      .unionByName(slice(col("ts") >= t0 + 7 * day))
    assert(unions(touching).nonEmpty)
    val overlapping = slice(col("ts") < t0 + 10 * day)
      .unionByName(slice(col("ts") >= t0 + 7 * day))
    assert(unions(overlapping).nonEmpty)
  }

  test("mixed point and range arms collapse only when provably disjoint") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    def v(c: org.apache.spark.sql.Column) = ev.filter(c).select(col("value"))
    val disjointMix = v(col("value") < 100.0)
      .unionByName(v(col("value") === 150.0))
      .unionByName(v(col("value") > 200.0))
    assert(unions(disjointMix).isEmpty, "point between two open ranges collapses")
    val cnt = disjointMix.count()
    val direct = ev.filter(
      col("value") < 100.0 || col("value") === 150.0 || col("value") > 200.0).count()
    assert(cnt == direct)
    val pointInRange = v(col("value") < 100.0)
      .unionByName(v(col("value") === 50.0))
    assert(unions(pointInRange).nonEmpty, "a point inside a range must block")
  }

  test("IN-arms merge and the rewrite stays disjointness-gated") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    val a = ev.filter(col("event_type").isin("view", "click")).select(col("value"))
    val b = ev.filter(col("event_type") === "purchase").select(col("value"))
    val merged = a.unionByName(b)
    assert(unions(merged).isEmpty, "IN + equality with disjoint literals collapses")
    val overlap = a.unionByName(
      ev.filter(col("event_type") === "click").select(col("value")))
    assert(unions(overlap).nonEmpty, "overlapping literal must block the rewrite")
  }

  test("non-deterministic projections block the collapse") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    // rand(seed) canonicalizes identically across arms, but ONE merged
    // scan draws one stream over the combined rows — a different multiset
    // than two per-arm streams
    val a = ev.filter(col("event_type") === "view")
      .select(col("value"), rand(42).as("r"))
    val b = ev.filter(col("event_type") === "click")
      .select(col("value"), rand(42).as("r"))
    assert(unions(a.unionByName(b)).nonEmpty,
      "per-arm random columns must keep their own draws")
  }

  test("equal-lo ties collapse regardless of arm order (point vs exclusive-lo range)") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    // v = 5 and (5, 10] are provably disjoint; the point must sort before
    // the exclusive-lo interval at the shared bound in EITHER arm order
    val point = ev.filter(col("user_id") === 5L).select(col("value"))
    val range = ev.filter(col("user_id") > 5L && col("user_id") <= 10L)
      .select(col("value"))
    assert(unions(point.unionByName(range)).isEmpty, "point-first order")
    assert(unions(range.unionByName(point)).isEmpty, "range-first order")
    val directCount = ev.filter(col("user_id") >= 5L && col("user_id") <= 10L).count()
    assert(point.unionByName(range).count() == directCount)
  }
}
