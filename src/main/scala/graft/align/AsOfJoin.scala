package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the canonical time-series
  * operator Spark lacks natively.
  *
  * Implementation: the scalable union trick rather than a custom
  * SparkPlan — tag build rows side=0 and probe rows side=1, union, then
  * one window pass per series ordered by (time, side, tiebreak) carrying
  * the last non-null build values forward, and keep probe rows. Cost: a
  * single shuffle on the series key + a sorted partition scan — the same
  * shape as any lag/ffill window, so it scales exactly like them
  * (contrast with a naive range join, which explodes to O(n·m) pairs).
  * Build rows at the same timestamp as a probe row sort first, so
  * "at-or-before" includes ties. Multiple build rows sharing one
  * timestamp are ordered by a hash of their value columns, so the
  * winning row is deterministic for a given dataset (which one wins is
  * arbitrary but stable across runs and partitionings).
  */
object AsOfJoin {

  /** left (probe) gains `valueCols` from the most recent right (build)
    * row with rightTime ≤ leftTime within the same `keys` group.
    * `leftTime` and `rightTime` may share the same column name: the
    * build side is reduced to (keys, valueCols, internal time) before
    * the union, so no probe column is shadowed or dropped. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, valueCols, forward = false)

  /** Forward variant: left gains `valueCols` from the EARLIEST right row
    * with rightTime ≥ leftTime (at-or-after, ties included) — the
    * "next quote after the order" direction. Same union + one-window
    * plan, scanned in descending time. Probes with no later build row
    * keep nulls (callers wanting inner semantics filter them). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, valueCols, forward = true)

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String],
      forward: Boolean): DataFrame = {
    require(!valueCols.contains(rightTime) && !keys.contains(rightTime),
      s"rightTime '$rightTime' must not also be a key or value column")
    val probeCols = left.columns.toSeq
    val lAligned = valueCols.foldLeft(
      left.withColumn("__t", col(leftTime))
        .withColumn("__side", lit(1))
        .withColumn("__tb", lit(0L)))((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    // Build side: only (keys, __t, __tb, valueCols) survive; every other
    // probe column is null-padded. rightTime itself never appears as a
    // named column past this point, so leftTime == rightTime is safe.
    val r = right.select(
      keys.map(col) ++ valueCols.map(col)
        :+ col(rightTime).as("__t")
        :+ xxhash64(valueCols.map(col): _*).as("__tb"): _*)
      .withColumn("__side", lit(0))
    val rAligned = probeCols.filterNot(c => keys.contains(c) || valueCols.contains(c))
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val outCols = (probeCols ++ valueCols :+ "__t" :+ "__side" :+ "__tb").distinct
    val unioned = lAligned.select(outCols.map(col): _*)
      .unionByName(rAligned.select(outCols.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((if (forward) col("__t").desc else col("__t").asc),
        col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1).drop("__t", "__side", "__tb")
  }
}
