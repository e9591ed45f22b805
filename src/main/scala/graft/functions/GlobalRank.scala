package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed global row numbering — the scale-safe replacement for
  * `row_number()/ntile()` over an UNPARTITIONED window, which moves the
  * whole input through one task (WindowExec's "No Partition Defined"
  * warning; measured 13× superlinear on the sf1 replica in
  * e5_zonemap_prune before this helper existed).
  *
  * Shape: range-repartition on the sort key (each partition owns a
  * contiguous key range) and sort ONCE within partitions; materialize
  * that layout; count rows per partition with a partial-aggregated
  * `spark_partition_id` count (32-row exchange — partition METADATA,
  * not data); turn the counts into prefix offsets; then assign each
  * row offset + its position in a single per-partition sweep over the
  * already-sorted data. One data shuffle, one sort, no second pass
  * re-sorting — the same two-phase structure as
  * `clean.Cleaning.forwardFillScan`. (A first cut used
  * `row_number over Window.partitionBy(pid)` for the local position;
  * that re-shuffled AND re-sorted the full input — 2× the data motion
  * for no semantic difference — so the sweep is the per-partition
  * imperative path that mapPartitions is actually for.)
  *
  * The sort key must be a TOTAL order (include a unique tiebreaker):
  * range partitioning puts equal keys in one partition, but a
  * non-total order would make ranks nondeterministic — same contract
  * as a global `row_number` itself when results must be reproducible.
  */
object GlobalRank {

  /** Core pass: (frame with `__gr_rank`, total row count — free from
    * the same per-partition counts the offsets need). */
  private def ranked(df: DataFrame, sort: Seq[Column]): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    // Materialize the sorted range layout once: the counts pass and
    // the rank pass below both read it; without the checkpoint each
    // would re-execute the upstream scan + shuffle + sort.
    val sorted = graft.Graft.materialize(
      df.repartitionByRange(parts, sort: _*).sortWithinPartitions(sort: _*))
    val counts = sorted.groupBy(spark_partition_id().as("__gr_pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offByPid: Map[Int, Long] = offsets.toMap
    val maxPid = if (counts.isEmpty) 0 else counts.map(_._1).max
    val offArr = Array.tabulate(maxPid + 1)(p => offByPid.getOrElse(p, 0L))
    val bc = spark.sparkContext.broadcast(offArr)
    val out = spark.createDataFrame(
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        var i = bc.value(pid)
        it.map { r => i += 1; Row.fromSeq(r.toSeq :+ i) }
      },
      sorted.schema.add("__gr_rank", LongType, nullable = false))
    (out, counts.map(_._2).sum)
  }

  /** `df` plus `rankCol` = 1-based global row number under `sort`. */
  def withRowNumber(df: DataFrame, rankCol: String, sort: Column*): DataFrame =
    ranked(df, sort)._1.withColumnRenamed("__gr_rank", rankCol)

  /** `df` plus `zoneCol` = `ntile(buckets)` under `sort`, computed from
    * global ranks with SQL ntile's exact arithmetic (the first n mod b
    * buckets get one extra row) — identical output to
    * `ntile(buckets).over(Window.orderBy(sort))` without the
    * single-partition sort. */
  def withNtile(df: DataFrame, zoneCol: String, buckets: Int,
      sort: Column*): DataFrame = {
    require(buckets > 0, s"ntile needs buckets > 0, got $buckets")
    val (ranks, n) = ranked(df, sort)
    val base = n / buckets
    val rem = n % buckets
    val cut = (base + 1) * rem
    ranks.withColumn(zoneCol,
        when(col("__gr_rank") <= cut,
          floor((col("__gr_rank") - 1) / (base + 1)) + 1)
          .otherwise(
            lit(rem) + floor((col("__gr_rank") - 1 - cut) / math.max(base, 1L)) + 1)
          .cast("long"))
      .drop("__gr_rank")
  }
}
