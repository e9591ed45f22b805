package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot grouping keys at cluster scale.
  *
  * AQE's skew-join splitting handles join-side skew automatically
  * (enabled in Graft.configure); salted aggregation is the manual
  * equivalent for groupBy on pathological key distributions: phase 1
  * aggregates on (key, salt) so a hot key spreads over `salts`
  * reducers, phase 2 merges the partials — algebraic aggregates only.
  */
object Skew {

  /** Two-phase salted sum/count per key; identical results to a direct
    * groupBy, but a hot key fans out over `salts` partitions first. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("count"))
  }
}
