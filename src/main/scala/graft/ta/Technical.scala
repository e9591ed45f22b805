package graft.ta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Technical indicators over long-format series (reference
  * algorithms/technical.py).
  *
  * All operators are single-pass window functions over
  * `partitionBy(seriesKeys).orderBy(order)` — one shuffle keyed by series,
  * then per-partition sorted scans. At 100 TB the shuffle is the only
  * data movement; each series stays on one executor core, and Spark's
  * sliding WindowExec frames give the same O(n) accumulator behavior the
  * reference hand-rolls (technical.py:229-241).
  */
object Technical {

  def seriesWindow(keys: Seq[String], order: Seq[Column]) =
    Window.partitionBy(keys.map(col): _*).orderBy(order: _*)

  /** W1, volatility variant (volatility.py:30-56): ln(p_i/p_{i-1}) only
    * where both prices are positive; invalid pairs are OMITTED (null here,
    * filter downstream). */
  def logReturnStrict(price: Column, keys: Seq[String], order: Seq[Column]): Column = {
    val prev = lag(price, 1).over(seriesWindow(keys, order))
    when(price > 0 && prev > 0, log(price / prev))
  }

  /** W1, technical variant (technical.py:104-154): same ratio but invalid
    * pairs yield 0.0 (only rows with a predecessor produce output). */
  def logReturnZero(price: Column, keys: Seq[String], order: Seq[Column]): Column = {
    val prev = lag(price, 1).over(seriesWindow(keys, order))
    when(prev.isNull, lit(null).cast("double"))
      .when(price > 0 && prev > 0, log(price / prev))
      .otherwise(lit(0.0))
  }

  /** W2 (technical.py:161-186): (p_i − p_{i-1})/p_{i-1}, 0.0 on zero
    * denominator; rows without a predecessor yield null. */
  def simpleReturn(price: Column, keys: Seq[String], order: Seq[Column]): Column = {
    val prev = lag(price, 1).over(seriesWindow(keys, order))
    when(prev.isNull, lit(null).cast("double"))
      .when(prev === 0.0, lit(0.0))
      .otherwise((price - prev) / prev)
  }

  /** W3 (technical.py:193-243) + W9 alignment (app.py:384-390): trailing
    * n-row mean, null for the first n−1 warm-up rows of each series. */
  def sma(price: Column, n: Int, keys: Seq[String], order: Seq[Column]): Column = {
    val w = seriesWindow(keys, order)
    when(row_number().over(w) >= n,
      avg(price).over(w.rowsBetween(-(n - 1), 0)))
  }

  /** A1/A2 (technical.py:27-97): mean + sample stddev per series.
    * Spark's stddev_samp uses a numerically stable merge formula — same
    * stability goal as the reference's two-pass (SURVEY.md §4). */
  def meanStd(df: DataFrame, valueCol: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(avg(col(valueCol)).as("mean"), stddev_samp(col(valueCol)).as("std"))
}
