package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once on their join
  * key so repeated joins/aggregations on that key run shuffle-free.
  *
  * At 100 TB this is the difference between re-exchanging the fact table
  * on every query and paying the shuffle once at ingest: two tables
  * bucketed on the same key with the same bucket count sort-merge-join
  * with NO Exchange on either side (BucketingSpec pins that plan).
  * Bucket count rule of thumb: total size / target partition size
  * (128-256 MB); must match on both join sides.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
