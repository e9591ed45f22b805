package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-partition offsets of the materialized `sorted` layout as a
    * (metadata-sized) literal-array lookup column indexed by
    * `spark_partition_id()`, given per-partition values `byPid`. Sized
    * by the layout's TOTAL partition count, not the max non-empty pid:
    * repartitionByRange leaves trailing partitions EMPTY when the sort
    * key has fewer distinct values than partitions (single-distinct-key
    * frames range into partition 0 only). */
  private def offsetLookup(sorted: DataFrame, byPid: Map[Int, Long]): Column =
    element_at(
      typedlit((0 until sorted.rdd.getNumPartitions).map(byPid.getOrElse(_, 0L))),
      spark_partition_id() + 1)

  /** Core pass: (frame with `__gr_rank`, total row count — free from
    * the same per-partition counts the offsets need).
    *
    * The rank assignment never leaves Catalyst: over the materialized
    * range-shuffled + within-partition-sorted layout, the rank is
    * `offset(pid) + runningCount` — a [[PartitionRunningSum]] of 1
    * plus the per-partition offsets inlined as ONE array literal
    * (≤ one slot per shuffle partition — metadata, not data). The
    * counts pass stays a 32-row aggregate over the checkpoint. An
    * earlier version swept `sorted.rdd.mapPartitionsWithIndex` +
    * `createDataFrame`, which converted every row out of and back
    * into the unsafe format and broke whole-stage codegen for
    * everything downstream — a fixed ~0.2–1.7 s tax per call at bench
    * scale for machinery only the second pass needed. */
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
    val out = sorted.withColumn("__gr_rank",
      offsetLookup(sorted, offsets.toMap)
        + PartitionRunningSum.running_sum(lit(1L)))
    (out, counts.map(_._2).sum)
  }

  /** `df` plus `rankCol` = 1-based global row number under `sort`. */
  def withRowNumber(df: DataFrame, rankCol: String, sort: Column*): DataFrame =
    ranked(df, sort)._1.withColumnRenamed("__gr_rank", rankCol)

  /** `df` plus, for each `(srcCol, outCol)` in `sums`, the running
    * total of `srcCol` (LongType) in global `sort` order — including
    * the current row when `inclusive`, else the exclusive prefix (0 at
    * the first row). The distributed replacement for
    * `sum(x).over(Window.orderBy(...))`, which is the same
    * single-task funnel as an unpartitioned `row_number`: range
    * shuffle + within-partition sort (materialized once), per-column
    * per-partition totals collected as partition METADATA (≤ one row
    * per partition), prefix offsets broadcast, and one accumulating
    * sweep over the already-sorted partitions. Same total-order
    * caveat as [[withRowNumber]] — though for sums, ties in `sort`
    * only affect intermediate (not post-aggregation) values. */
  def withPrefixSums(df: DataFrame, sums: Seq[(String, String)],
      inclusive: Boolean, sort: Column*): DataFrame = {
    require(sums.nonEmpty, "withPrefixSums needs at least one column")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val sorted = graft.Graft.materialize(
      df.repartitionByRange(parts, sort: _*).sortWithinPartitions(sort: _*))
    sums.foreach { case (src, _) =>
      require(sorted.schema(src).dataType == LongType,
        s"withPrefixSums expects LongType for '$src', got ${sorted.schema(src).dataType}")
    }
    val aggs = sums.zipWithIndex.map { case ((src, _), i) =>
      sum(col(src)).as(s"__ps_$i")
    }
    val totals = sorted
      .groupBy(spark_partition_id().as("__ps_pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), Array.tabulate(sums.size)(i =>
        if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))))
      .sortBy(_._1)
    // Exclusive scan of the per-partition totals, per summed column.
    val offByPid = scala.collection.mutable.Map.empty[Int, Array[Long]]
    val acc = Array.fill(sums.size)(0L)
    totals.foreach { case (pid, t) =>
      offByPid(pid) = acc.clone()
      var i = 0; while (i < acc.length) { acc(i) += t(i); i += 1 }
    }
    // One codegen'd projection: each output is offset(pid) + a
    // per-partition running sum (its own state per column); exclusive
    // mode subtracts the current row back out (nulls counted as 0,
    // matching the accumulator).
    sums.zipWithIndex.foldLeft(sorted) { case (d, ((src, out), i)) =>
      val incl = offsetLookup(sorted, offByPid.map { case (p, t) => (p, t(i)) }.toMap) +
        PartitionRunningSum.running_sum(col(src))
      d.withColumn(out,
        if (inclusive) incl else incl - coalesce(col(src), lit(0L)))
    }
  }

  /** Per-group `row_number` for BOUNDED-cardinality group keys whose
    * per-group row counts scale with data. `Window.partitionBy(group)`
    * there funnels every group through ONE task (the low-cardinality-
    * window skew bomb); a partitioned window remains the right tool
    * when group cardinality is high (many small partitions, no skew).
    * Shape: ONE global ranking over (group ++ sort) order — groups are
    * contiguous under range partitioning — then each group's rank
    * offset is recovered as `min(global rank) − 1` per group (an
    * aggregate over the already-materialized ranked layout, reduced to
    * one row per group) and broadcast-joined back. No ordering
    * assumptions beyond the global machinery's own. */
  def withGroupRowNumber(df: DataFrame, rankCol: String,
      groupCols: Seq[String], sort: Column*): DataFrame = {
    require(groupCols.nonEmpty, "withGroupRowNumber needs group columns")
    val gcols = groupCols.map(col)
    val ranked = withRowNumber(df, "__gg_rank", gcols ++ sort: _*)
    val off = ranked.groupBy(gcols: _*)
      .agg((min(col("__gg_rank")) - 1L).as("__gg_off"))
    ranked.join(broadcast(off), groupCols)
      .withColumn(rankCol, col("__gg_rank") - col("__gg_off"))
      .drop("__gg_rank", "__gg_off")
  }

  /** Per-group running totals for BOUNDED-cardinality group keys — the
    * [[withPrefixSums]] of `sum(x).over(Window.partitionBy(group)
    * .orderBy(sort))`, with the same skew rationale as
    * [[withGroupRowNumber]]. One global prefix-sum pass in
    * (group ++ sort) order; each group's starting offset is the
    * exclusive prefix of the per-group totals in group order, computed
    * with a window over the DISTINCT-GROUP frame (metadata-sized under
    * the bounded-cardinality contract; its `orderBy(group)` matches the
    * global pass's ascending range order) and broadcast-joined back. */
  def withGroupPrefixSums(df: DataFrame, sums: Seq[(String, String)],
      inclusive: Boolean, groupCols: Seq[String], sort: Column*): DataFrame = {
    require(groupCols.nonEmpty, "withGroupPrefixSums needs group columns")
    val gcols = groupCols.map(col)
    val cum = withPrefixSums(df, sums.map { case (s, o) => (s, s"__gg_$o") },
      inclusive, gcols ++ sort: _*)
    val aggs = sums.map { case (src, out) => sum(col(src)).as(s"__gt_$out") }
    val w = Window.orderBy(gcols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = sums.foldLeft(
        cum.groupBy(gcols: _*).agg(aggs.head, aggs.tail: _*)) {
        case (d, (_, out)) =>
          d.withColumn(s"__go_$out",
            coalesce(sum(col(s"__gt_$out")).over(w), lit(0L)))
      }
      .select(gcols ++ sums.map(s => col(s"__go_${s._2}")): _*)
    sums.foldLeft(cum.join(broadcast(off), groupCols)) { case (d, (_, out)) =>
      d.withColumn(out, col(s"__gg_$out") - col(s"__go_$out"))
        .drop(s"__gg_$out", s"__go_$out")
    }
  }

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
