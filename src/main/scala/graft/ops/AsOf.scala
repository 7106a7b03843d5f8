package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (backward) join — an operator core Spark lacks natively: for
  * every left row, attach the single LATEST right row with
  * right.ts <= left.ts within the same key (event attribution, price
  * lookup, slowly-changing joins).
  *
  * Composed from built-ins per the custom-operator preference order:
  * tag both sides, union, and run ONE ordered window per key taking
  * `last(value, ignoreNulls)` over the running frame — exactly one
  * shuffle keyed by `keyCol`, never the quadratic range cross-join the
  * naive `left.join(right, r.ts <= l.ts)` plans. Right rows sort BEFORE
  * left rows at equal ts (inclusive <=); right-row ties at one ts
  * resolve deterministically to the largest `rightOrdCol`.
  *
  * ATOMIC ROW semantics: the right value columns are packed into ONE
  * struct (NULL as a whole on left-side rows) and a single
  * last(struct, ignoreNulls) picks it, so every asof_* output column
  * comes from the SAME right row even when individual right values are
  * NULL — matching the oracle's LATERAL-limit-1 whole-row pick. (The
  * previous per-column last() could stitch columns from different
  * right rows when a value column contained NULLs — ADVICE r03.)
  *
  * Output: every left column, plus `asof_<c>` for each requested right
  * column (plus the right ord and ts), NULL when no right row precedes. */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightOrdCol: String, rightValCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rVals = (rightValCols :+ rightOrdCol :+ tsCol).distinct
    val rStructType = org.apache.spark.sql.types.StructType(
      rVals.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lSel = lCols.map(col) ++
      Seq(lit(1).as("__side"), lit(null).cast("long").as("__ord"),
        lit(null).cast(rStructType).as("__r"))
    val rSel = lCols.map { c =>
      if (c == keyCol || c == tsCol) col(c)
      else lit(null).cast(left.schema(c).dataType).as(c)
    } ++
      Seq(lit(0).as("__side"), col(rightOrdCol).cast("long").as("__ord"),
        struct(rVals.map(c => col(c).as(c)): _*).as("__r"))
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__ord").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // ONE ignoreNulls pick of the whole struct: right rows always carry
    // a non-null struct (even if its fields are null), left rows a null
    // struct — so the pick lands on exactly one right ROW, atomically
    val filled = u.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(lCols.map(col) ++ rVals.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Range (interval) join, the other operator Spark lacks natively:
    * all pairs of rows with the same key whose timestamps lie within
    * `windowSec` of each other. Bucketized equi-join — rows land in
    * floor(sec/window) buckets, one side probes its three neighboring
    * buckets, and the exact |dt| <= window filter runs after the
    * equi-join — so the plan is a hash join on (key, bucket), NEVER the
    * quadratic inequality cross-join Catalyst would otherwise plan. A
    * pair matches through exactly one probe offset, so no dedup pass is
    * needed. Returns (id1 < id2, dt_sec = sec2 - sec1). */
  def temporalNeighbors(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, windowSec: Long): DataFrame = {
    val e = df.select(col(keyCol), col(idCol),
        unix_timestamp(col(tsCol)).as("sec"))
      .withColumn("bkt", floor(col("sec") / windowSec))
    val a = e.select(col(keyCol), col(idCol).as("id1"),
      col("sec").as("sec1"), col("bkt"))
    val b = e.select(col(keyCol), col(idCol).as("id2"), col("sec").as("sec2"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bkt"))
    a.join(b, Seq(keyCol, "bkt"))
      .filter(col("id1") < col("id2") &&
        abs(col("sec1") - col("sec2")) <= windowSec)
      .select(col("id1"), col("id2"), (col("sec2") - col("sec1")).as("dt_sec"))
  }
}
