package graft

import graft.operators.{CohortQueries, OpsQueries}
import org.apache.spark.sql.functions._

/** Invariants for the cohort/seasonality family and the pruning ops
  * (e4 Bloom, e5 zone map). Value-level checks live in the DuckDB
  * oracle; these pin scale-independent properties. */
class CohortOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("f6 cohort: offset 0 is the cohort size and retention never exceeds it") {
    val rows = CohortQueries.f6Cohort(spark, dir)
      .select("cohort", "offset_w", "active_users")
      .as[(java.sql.Date, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, w, _) =>
      assert(w >= 0, s"negative offset $w")
      // cohorts are week-truncated: Monday in the ISO calendar
      assert(c.toLocalDate.getDayOfWeek == java.time.DayOfWeek.MONDAY, s"cohort $c not Monday")
    }
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val size = rs.find(_._2 == 0L).map(_._3)
      assert(size.nonEmpty, s"cohort $c missing offset 0")
      rs.foreach { case (_, w, n) =>
        assert(n <= size.get, s"cohort $c offset $w active $n exceeds size ${size.get}")
      }
    }
  }

  test("a21 seasonality: ISO weekdays, weighted seasonal components sum to ~0 per series") {
    val rows = CohortQueries.a21Seasonality(spark, dir)
      .select("user_id", "dow", "n_days", "seasonal")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 7))
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val weighted = rs.map(r => r._3 * r._4).sum
      val n = rs.map(_._3).sum
      // exact up to the 1e-6 display grid on each of <=7 components
      assert(math.abs(weighted) <= n * 1e-6 + 1e-9, s"user $u weighted seasonal $weighted")
    }
  }

  test("e4 bloom: no false negatives among probed members, fp rate in [0,1]") {
    val r = OpsQueries.e4BloomPrune(spark, dir)
      .select("n_keys", "n_probes", "member_probes", "bits_set",
        "bloom_pass", "true_pos", "false_pos", "fp_rate")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].head()
    val (nKeys, nProbes, memberProbes, bitsSet, pass, tp, fp, rate) = r
    // THE Bloom guarantee: every probed member passes
    assert(tp == memberProbes,
      s"false negatives: $tp of $memberProbes probed members passed")
    assert(memberProbes <= nKeys, "members without lineitems cannot be probed")
    assert(pass == tp + fp && fp >= 0)
    assert(rate >= 0.0 && rate <= 1.0)
    assert(bitsSet <= 3L * nKeys && bitsSet <= 65536L, s"bits_set $bitsSet")
    assert(nProbes >= memberProbes)
  }

  test("e5 zone map: flags match the stats; clustering by price makes zones prunable") {
    val rows = OpsQueries.e5ZonemapPrune(spark, dir)
      .select("layout", "n_rows", "max_price", "prunable")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, mx, p) =>
      assert(n > 0)
      // max_price is displayed on the 1e-2 grid; the flag was computed on
      // the raw value, so allow the grid's half-step at the boundary
      if (p == 1) assert(mx <= 55000.0 + 0.005, s"prunable zone max $mx")
      else assert(mx > 55000.0 - 0.005, s"non-prunable zone max $mx")
    }
    val pruned = rows.groupBy(_._1).map { case (l, rs) =>
      l -> rs.count(_._4 == 1L).toDouble / rs.size
    }
    // uncorrelated layout prunes (almost) nothing; clustered layout prunes
    // roughly the sub-threshold share of the price distribution
    assert(pruned("by_price") > pruned("by_month") + 0.2,
      s"clustering should dominate: $pruned")
  }
}
