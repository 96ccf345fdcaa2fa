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

  test("duplicate literals do NOT collapse (multiset multiplicity)") {
    val df = slices(Seq("view", "view"))
    assert(unions(df).nonEmpty, "a duplicated arm doubles rows; IN would not")
    assert(df.count() ==
      2 * ev.filter(col("event_type") === "view").count())
  }

  test("an arm with an extra predicate does NOT collapse") {
    graft.plans.UnionDisjointFilterCollapse.install(spark)
    val a = ev.filter(col("event_type") === "view").select(col("value"))
    val b = ev.filter(col("event_type") === "click" && col("value") > 100)
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
}
