package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — the scale-safe replacement for
  * `row_number()/ntile()` over an UNPARTITIONED window, which moves the
  * whole input through one task (WindowExec's "No Partition Defined"
  * warning; measured 13× superlinear on the sf1 replica in
  * e5_zonemap_prune before this helper existed).
  *
  * Shape: range-repartition on the sort key (each partition owns a
  * contiguous key range), count rows per partition, collect the ≤
  * numShufflePartitions counts to the driver (documented-small — this
  * is partition METADATA, not data), turn them into prefix offsets,
  * and add each row's within-partition `row_number` to its partition's
  * offset. Global rank = offset + local rank, exact at any scale; both
  * shuffles (range + the window's hash-by-pid) are fully parallel.
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
    // Materialize the ranged layout once: the counts pass and the rank
    // pass below would otherwise each re-execute the upstream plan.
    val ranged = graft.Graft.materialize(
      df.repartitionByRange(parts, sort: _*)
        .withColumn("__gr_pid", spark_partition_id()))
    val counts = ranged.groupBy("__gr_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    // Offsets ride into the plan as one map literal (≤ parts entries).
    // Empty partitions simply have no map entry — and no rows to rank.
    val offMap = map(offsets.flatMap { case (pid, off) =>
      Seq(lit(pid), lit(off)) }: _*)
    val local = Window.partitionBy("__gr_pid").orderBy(sort: _*)
    val out = ranged
      .withColumn("__gr_rank",
        coalesce(element_at(offMap, col("__gr_pid")), lit(0L)) +
          row_number().over(local))
      .drop("__gr_pid")
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
