package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X3: the reference's compare_two_assets façade
  * (similarity.py:440-530) — align two calendar-aligned price series
  * positionally (keep positions where BOTH are non-null and > 0),
  * compute technical-variant log returns on each aligned series, then
  * all four similarity measures over the returns.
  *
  * Returns the all-zero result when fewer than 2 aligned points
  * (similarity.py:503-512). One job: a date join + window + one
  * multi-aggregate pass. DTW dispatches on series length: at or below
  * `collectLimit` points the pair's return arrays collect to the
  * driver and the kernel runs locally (the reference's regime,
  * ~1.8k points); above it the points stay on the cluster and the
  * kernel runs inside a typed [[DtwPairAggregator]] on the final
  * aggregate task — the driver only receives the scalar. Both paths
  * feed the identical sorted arrays to [[Dtw.distance]], so the
  * dispatch is invisible in the result (InvariantsSpec property-checks
  * the equality).
  */
object CompareAssets {

  case class SimilarityResult(euclidean: Double, pearson: Double, dtw: Double,
    cosine: Double, n_points: Long)

  val Zero: SimilarityResult = SimilarityResult(0.0, 0.0, 0.0, 0.0, 0L)

  /** `bars`: long table with (dateCol, keyCol, valueCol), calendar-aligned. */
  def compare(bars: DataFrame, keyA: String, keyB: String,
      keyCol: String = "symbol", dateCol: String = "date",
      valueCol: String = "close", collectLimit: Long = 4096L): SimilarityResult = {
    val spark = bars.sparkSession
    import spark.implicits._

    val a = bars.filter(col(keyCol) === keyA)
      .select(col(dateCol).as("d"), col(valueCol).as("pa"))
    val b = bars.filter(col(keyCol) === keyB)
      .select(col(dateCol).as("d"), col(valueCol).as("pb"))
    val aligned = a.join(b, "d")
      .filter(col("pa").isNotNull && col("pb").isNotNull &&
        col("pa") > 0 && col("pb") > 0)

    val w = Window.orderBy("d")
    // technical-variant returns over ALIGNED positions (0.0 on invalid
    // pairs — technical.py:151-153); aligned values are all positive, so
    // only the ratio path fires.
    val rets = aligned
      .withColumn("prev_a", lag(col("pa"), 1).over(w))
      .withColumn("prev_b", lag(col("pb"), 1).over(w))
      .filter(col("prev_a").isNotNull)
      .select(col("d"),
        when(col("pa") > 0 && col("prev_a") > 0, log(col("pa") / col("prev_a")))
          .otherwise(0.0).as("a"),
        when(col("pb") > 0 && col("prev_b") > 0, log(col("pb") / col("prev_b")))
          .otherwise(0.0).as("b"))
      .cache()

    try {
      val n = rets.count()
      if (n < 1 || aligned.count() < 2) return Zero
      val m = Similarity.metrics(rets.select("a", "b")).head()
      val dtw =
        if (n <= collectLimit) {
          val arrs = rets.orderBy("d").select("a", "b").as[(Double, Double)].collect()
          Dtw.distance(arrs.map(_._1), arrs.map(_._2))
        } else
          rets.select(row_number().over(w).cast("long").as("pos"),
              col("a"), col("b"))
            .as[(Long, Double, Double)]
            .select(DtwPairAggregator.column())
            .head()
      SimilarityResult(
        euclidean = m.getAs[Double]("euclidean"),
        pearson = m.getAs[Double]("pearson"),
        dtw = dtw,
        cosine = m.getAs[Double]("cosine"),
        n_points = n)
    } finally rets.unpersist()
  }
}
