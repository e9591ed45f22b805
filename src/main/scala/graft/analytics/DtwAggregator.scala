package graft.analytics

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** DTW as a typed `Aggregator` — the executor-side path for series too
  * long to collect (SURVEY.md §7.3's v2 note for X1/X3).
  *
  * Input rows are `(pos, a, b)` aligned points in ANY order and on ANY
  * partitioning: partial buffers concatenate under `merge`, and
  * `finish` sorts once by position before running the banded 2-row DP
  * kernel ([[Dtw.distance]]) inside the final aggregate task. The
  * driver only ever sees the scalar distance — contrast the collected
  * fast path in [[CompareAssets.compare]], which ships the whole pair
  * to the driver and is kept only below its `collectLimit`.
  *
  * Memory is one pair's aligned points on one executor — the same
  * bound the DP kernel itself needs. Grouped by a pair key
  * (`ds.groupByKey(...).agg(DtwPairAggregator.column())`), pairs
  * aggregate in parallel and each key's buffer stays its own series
  * length, which is the 100 TB shape: series length is bounded by the
  * calendar, pair count by the catalog, and neither ever lands on the
  * driver.
  */
class DtwPairAggregator(window: Option[Int] = None)
    extends Aggregator[(Long, Double, Double), Vector[(Long, Double, Double)], Double]
    with Serializable {

  override def zero: Vector[(Long, Double, Double)] = Vector.empty

  override def reduce(buf: Vector[(Long, Double, Double)],
      x: (Long, Double, Double)): Vector[(Long, Double, Double)] = buf :+ x

  override def merge(x: Vector[(Long, Double, Double)],
      y: Vector[(Long, Double, Double)]): Vector[(Long, Double, Double)] = x ++ y

  override def finish(buf: Vector[(Long, Double, Double)]): Double = {
    val sorted = buf.sortBy(_._1)
    Dtw.distance(sorted.iterator.map(_._2).toArray,
      sorted.iterator.map(_._3).toArray, window)
  }

  override def bufferEncoder: Encoder[Vector[(Long, Double, Double)]] =
    ExpressionEncoder()

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object DtwPairAggregator {
  /** The aggregator as a `TypedColumn` for `Dataset[(Long, Double,
    * Double)].select(...)` / `KeyValueGroupedDataset.agg(...)`. */
  def column(window: Option[Int] = None): TypedColumn[(Long, Double, Double), Double] =
    new DtwPairAggregator(window).toColumn.name("dtw")
}
