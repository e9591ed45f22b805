package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL data-quality operators (reference etl/data_cleaner.py — SURVEY.md
  * §2.2 C1-C4). All are DataFrame => DataFrame transforms over the long
  * bar schema (or any table with the named columns) — single scan each,
  * no shuffle except the series-key window for forward fill. */
object Cleaning {

  val OhlcvFields: Seq[String] = Seq("open", "high", "low", "close", "volume")

  /** C1: per-field null-cell counts + total missing (data_cleaner.py:27-85). */
  def missingReport(df: DataFrame, fields: Seq[String] = OhlcvFields): DataFrame = {
    val perField = fields.map(f =>
      sum(when(col(f).isNull, 1).otherwise(0)).cast("long").as(s"missing_$f"))
    val total = fields.map(f => when(col(f).isNull, 1).otherwise(0))
      .reduce(_ + _)
    df.agg(perField.head, perField.tail :+
      sum(total).cast("long").as("missing_total"): _*)
  }

  /** C1b: rows having at least one missing field, with their positions. */
  def affectedRows(df: DataFrame, fields: Seq[String], keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("row_index", row_number().over(w) - 1)
      .filter(fields.map(col(_).isNull).reduce(_ || _))
  }

  /** C2: OHLC consistency anomalies. Emits one row per (row, anomaly type);
    * checks skip when a needed field is null (data_cleaner.py:88-147).
    * Type strings match the reference exactly. */
  def inconsistencies(df: DataFrame): DataFrame = {
    val anomalies = array_compact(array(
      when(col("high").isNotNull && col("low").isNotNull &&
        col("high") < col("low"), "High_less_than_Low"),
      when(col("close").isNotNull && col("high").isNotNull && col("low").isNotNull &&
        (col("close") < col("low") || col("close") > col("high")),
        "Close_outside_Low_High_range"),
      when(col("open").isNotNull && col("high").isNotNull && col("low").isNotNull &&
        (col("open") < col("low") || col("open") > col("high")),
        "Open_outside_Low_High_range")))
    df.withColumn("anomaly_type", explode(anomalies))
  }

  /** C3/W7: forward fill — replace null with the last non-null previous
    * value within the series; leading nulls stay null (data_cleaner.py:150-191). */
  def forwardFill(df: DataFrame, field: String, keys: Seq[String],
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn(field, last(col(field), ignoreNulls = true).over(w))
  }

  /** C4: drop rows whose close is still null after forward fill
    * (data_cleaner.py:194-220). */
  def dropInvalid(df: DataFrame, field: String = "close"): DataFrame =
    df.filter(col(field).isNotNull)

  /** Forward fill for ONE series too large for a single task. The
    * unbounded-preceding window of [[forwardFill]] puts a whole series in
    * one task; but "carry the last non-null" is an associative fold, so
    * the same two-pass parallel-prefix treatment as
    * [[graft.ta.Indicators.emaScan]] applies — and here it is EXACT
    * (values pass through untouched): each partition reports its last
    * non-null value, the driver prefix gives each partition its carry-in,
    * and a second pass fills locally. Expects (event_id, ts, v). */
  def forwardFillScan(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val sorted = graft.Graft.materialize(
      df.select(col("event_id").cast("long"), col("ts").cast("long"),
          col("v").cast("double"))
        .repartitionByRange(col("ts"), col("event_id"))
        .sortWithinPartitions("ts", "event_id"))
    val rdd = sorted.as[(Long, Long, Option[Double])].rdd
    val nParts = rdd.getNumPartitions
    val lasts = rdd.mapPartitionsWithIndex { (pid, it) =>
      var lastNonNull: Option[Double] = None
      it.foreach { case (_, _, v) => if (v.isDefined) lastNonNull = v }
      Iterator.single((pid, lastNonNull))
    }.collect().sortBy(_._1)
    val entries = Array.fill[Option[Double]](nParts)(None)
    var carry: Option[Double] = None
    lasts.foreach { case (pid, l) =>
      entries(pid) = carry
      if (l.isDefined) carry = l
    }
    val bc = s.sparkContext.broadcast(entries)
    rdd.mapPartitionsWithIndex { (pid, it) =>
      var st = bc.value(pid)
      it.map { case (id, _, v) =>
        if (v.isDefined) st = v
        (id, st)
      }
    }.toDF("event_id", "v")
  }
}
