package graft.series

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** cs_if — the stateful branch-consume conditional (func.c:2559-2681).
  *
  * Unlike cs_iif (element-wise `when`), cs_if advances ONLY the chosen
  * branch: for the i-th row where cond holds, the output is a[i] (the i-th
  * element of series a, not the element at the row's own position); for the
  * j-th row where it doesn't, b[j]. The reference implements this as an
  * iterator state machine; set-oriented equivalent: the branch index is the
  * 0-based rank of the row among rows with the same truth value, and the
  * branch value is a positional gather (join on pos) with that index.
  *
  * Cost shape: one window (rank within (keys, cond) — a key-partitioned
  * shuffle) plus two equi-joins on (keys, idx), each broadcastable when the
  * branch series are small. No driver-side state, scales per key.
  */
object Conditional {

  /** @param cond  frame with keys, `pos`, and boolean/int column `condCol`
    * @param a     true-branch series: keys, `pos`, `valueCol`
    * @param b     false-branch series: same shape
    * @return cond frame + `out` column with the branch-consumed value
    *         (null when the chosen branch is exhausted, matching the
    *         reference's end-of-sequence).
    */
  def csIf(cond: DataFrame, keys: Seq[String], condCol: String,
           a: DataFrame, b: DataFrame, valueCol: String,
           out: String = "if_value"): DataFrame = {
    graft.window.Moving.guardNames(cond.columns.toSeq,
      Seq("__bi", "__t", out), "csIf")
    val truth = col(condCol).cast("boolean")
    // Null conditions choose no branch: drop them up front so BOTH paths
    // agree (the keyed window used to silently drop them at the filter,
    // while the keyless scan's getBoolean threw). The reference has no
    // NULL elements at all (SURVEY §1.2), so any policy is an extension;
    // dropping mirrors the filter semantics of the final branch split.
    val cond0 = cond.filter(truth.isNotNull)
    val withIdx =
      if (keys.isEmpty) {
        // rank-within-truth = running count of same-truth rows − 1. A
        // window partitioned by the boolean would be TWO tasks total;
        // one vector monoid scan carries BOTH running counts (true, false)
        // — counting actual rows, so non-dense pos cannot skew the index.
        val flagged = cond0.withColumn("__t", truth)
        val tIdx = flagged.schema.fieldIndex("__t")
        graft.window.Moving.monoidScanRanged(flagged, Seq(), Seq("__tc", "__fc"))(
          Array(0.0, 0.0)) { r =>
          if (r.getBoolean(tIdx)) Array(1.0, 0.0) else Array(0.0, 1.0)
        } { (a, b) => Array(a(0) + b(0), a(1) + b(1)) }
          .withColumn("__bi",
            when(col("__t"), col("__tc").cast("long") - 1L)
              .otherwise(col("__fc").cast("long") - 1L))
          .drop("__t", "__tc", "__fc")
      } else {
        val w = Window.partitionBy(keys.map(col) :+ truth: _*).orderBy(col("pos"))
        cond0.withColumn("__bi", row_number().over(w).cast("long") - 1L)
      }
    val cols = cond.columns.toSeq
    // both union legs filter the SAME ranked frame — materialize it once
    // (lazy local checkpoint, the Dedup self-join pattern) or the whole
    // rank/scan pipeline over cond recomputes per leg
    val idx = withIdx.localCheckpoint(eager = false)
    def branch(src: DataFrame, rows: DataFrame): DataFrame =
      rows.join(
        src.select((keys.map(col) :+ col("pos").as("__bi")) :+ col(valueCol).as(out): _*),
        keys :+ "__bi", "left")
    branch(a, idx.filter(truth))
      .unionByName(branch(b, idx.filter(!truth)))
      .select((cols :+ out).map(col): _*)
  }
}
