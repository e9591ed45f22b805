package graft

import graft.operators.WarehouseQueries
import org.apache.spark.sql.functions._

/** Invariants for the warehouse-maintenance family (SCD2, full-outer
  * reconciliation, session paths). */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("scd2: intervals tile each user's timeline — no overlap, no gap, one open row") {
    val rows = WarehouseQueries.qScd2Intervals(spark, dir)
      .select("user_id", "event_type", "valid_from_us", "valid_to_us", "is_current")
      .as[(Long, String, Long, Option[Long], Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._3)
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_._4.isEmpty) == 1, s"user $u open intervals")
      assert(sorted.last._4.isEmpty, s"user $u current interval not last")
      // consecutive intervals chain exactly: valid_to == next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4.contains(b._3), s"user $u gap/overlap at ${a._4} -> ${b._3}")
          assert(a._2 != b._2, s"user $u adjacent intervals share type ${a._2}")
        case _ =>
      }
    }
  }

  test("full-outer recon: diff arithmetic holds and totals match per-type counts") {
    val rows = WarehouseQueries.qFullOuterRecon(spark, dir)
      .select("n_clicks", "n_views", "diff").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, v, d) => assert(d == c - v) }
    val ev = spark.read.parquet(s"$dir/events.parquet")
    assert(rows.map(_._1).sum == ev.filter(col("event_type") === "click").count())
    assert(rows.map(_._2).sum == ev.filter(col("event_type") === "view").count())
  }

  test("f8 paths: session count conserved, paths bounded at 3 hops, top-20 ordered") {
    val rows = WarehouseQueries.f8TopPaths(spark, dir)
      .select("path", "n_sessions").as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (p, n) =>
      assert(p.split(">").length <= 3, s"path $p too long")
      assert(n >= 1)
    }
    val counts = rows.map(_._2)
    assert(counts.sameElements(counts.sortBy(-_)), "must be ordered by count desc")
  }
}
