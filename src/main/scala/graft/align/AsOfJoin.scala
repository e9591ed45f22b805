package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the canonical time-series
  * operator Spark lacks natively.
  *
  * Implementation: the scalable union trick rather than a custom
  * SparkPlan — tag build rows side=0 and probe rows side=1, union, then
  * one window pass per series ordered by (time, side) carrying the last
  * non-null build values forward, and keep probe rows. Cost: a single
  * shuffle on the series key + a sorted partition scan — the same
  * shape as any lag/ffill window, so it scales exactly like them
  * (contrast with a naive range join, which explodes to O(n·m) pairs).
  * Build rows at the same timestamp as a probe row sort first, so
  * "at-or-before" includes ties.
  */
object AsOfJoin {

  /** left (probe) gains `valueCols` from the most recent right (build)
    * row with rightTime ≤ leftTime within the same `keys` group. */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    val probeCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lAligned = valueCols.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right.select((keys :+ rightTime).map(col) ++ valueCols.map(col): _*)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
    val rAligned = probeCols.filterNot(c => keys.contains(c) || valueCols.contains(c))
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .drop(rightTime)

    val unioned = lAligned.select((probeCols ++ valueCols :+ "__t" :+ "__side").distinct.map(col): _*)
      .unionByName(rAligned.select((probeCols ++ valueCols :+ "__t" :+ "__side").distinct.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("__side") === 1).drop("__t", "__side")
  }
}
