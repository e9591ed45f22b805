package graft.operators

import graft.Graft
import graft.Graft.Q
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-operations diagnostics: the queries an operator of a 100 TB
  * pipeline runs ABOUT the data rather than ON it — key-skew profiling
  * (is this join about to produce a straggler?), sketch-free
  * approximate quantiles (what threshold splits the p99?), and
  * space-filling-curve layout (what clustering key co-locates a 2-D
  * range predicate?). None exist in the reference (its single-node
  * pandas frames never skew); all three are standard ops practice on
  * distributed engines.
  *
  * Numeric policy per CoreQueries: counts stay integral; ratios are one
  * IEEE division of exact integers (bit-identical cross-engine) rounded
  * at 6 dp; histogram edges are a fixed chain of IEEE ops on exact
  * min/max/count scalars, identical on both engines.
  */
object OpsQueries {

  /** E1: hot-key profile of the events stream — per-key counts, each
    * hot key's share of the table, and its skew factor (count / mean
    * count). The number that predicts shuffle stragglers: a skew factor
    * of k means the hottest reducer partition runs ~k× the average, and
    * `skew > ~4` is the usual trigger for salting (qSaltedAgg) or AQE
    * skew-join splitting.
    *
    * Scale: one key-partitioned count (map-side combined), one 2-row
    * global aggregate broadcast back over the per-key counts, then
    * top-10 via TakeOrderedAndProject — no global sort, no driver
    * collect. */
  val e1SkewProfile: Q = (s, dir) => {
    val counts = Graft.table(s, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum(col("cnt")).as("total"), count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col("user_id"), col("cnt"),
        round(col("cnt") / col("total"), 6).as("share"),
        round((col("cnt") * col("n_keys")) / col("total"), 6).as("skew"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(10)
  }

  val e1SkewProfileSql: String =
    """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
      |     g AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM c)
      |SELECT user_id, cnt,
      |       ROUND(cnt / total, 6) AS share,
      |       ROUND((cnt * n_keys) / total, 6) AS skew
      |FROM c, g
      |ORDER BY cnt DESC, user_id
      |LIMIT 10""".stripMargin

  /** E2: approximate quantiles (p50/p90/p99 of event value) from a
    * fixed 1000-bin histogram — the shuffle-cheap alternative to an
    * exact percentile sort at 100 TB. Exact percentiles (a5Percentile)
    * need a full sort or a per-group collect; this needs ONE pass for
    * min/max/count plus one 1000-group aggregate, and the bin counts
    * (≤1000 rows) are trivially mergeable across any number of
    * executors. Error is bounded by one bin width (0.1 % of the value
    * range) — and unlike t-digest/GK sketches the result is fully
    * deterministic, hence oracle-checkable cell-by-cell.
    *
    * The estimate is the LEFT EDGE of the first bin whose cumulative
    * count reaches p·n: edge = min + bin·(max−min)/1000, a fixed chain
    * of IEEE ops on exact scalars — identical cross-engine, no rounding
    * needed. */
  val e2HistQuantile: Q = (s, dir) => {
    val v = Graft.table(s, dir, "events").select(col("value"))
    val stats = v.agg(min("value").as("lo"), max("value").as("hi"),
      count(lit(1)).as("n"))
    val binned = v.crossJoin(broadcast(stats))
      .select(least(floor((col("value") - col("lo")) / (col("hi") - col("lo")) * 1000),
        lit(999)).cast("int").as("bin"), col("lo"), col("hi"), col("n"))
      .groupBy("bin", "lo", "hi", "n").agg(count(lit(1)).as("bc"))
    val cum = binned.select(col("bin"), col("lo"), col("hi"), col("n"),
      sum(col("bc")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"))
    val ps = s.createDataFrame(Seq(Tuple1(0.5), Tuple1(0.9), Tuple1(0.99)))
      .toDF("p")
    ps.crossJoin(cum)
      .filter(col("cum") >= col("p") * col("n"))
      .groupBy("p")
      .agg(min(col("lo") + col("bin") * (col("hi") - col("lo")) / 1000.0).as("est"))
      .orderBy("p")
  }

  val e2HistQuantileSql: String =
    """WITH g AS (SELECT MIN(value) AS lo, MAX(value) AS hi, COUNT(*) AS n FROM events),
      |     b AS (SELECT LEAST(CAST(FLOOR((value - lo) / (hi - lo) * 1000) AS INTEGER), 999) AS bin,
      |                  lo, hi, n, COUNT(*) AS bc
      |           FROM events, g GROUP BY 1, 2, 3, 4),
      |     c AS (SELECT bin, lo, hi, n,
      |                  SUM(bc) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |           FROM b),
      |     p AS (SELECT CAST(UNNEST([0.5, 0.9, 0.99]) AS DOUBLE) AS p)
      |SELECT p.p, MIN(c.lo + c.bin * (c.hi - c.lo) / 1000.0) AS est
      |FROM p, c
      |WHERE c.cum >= p.p * c.n
      |GROUP BY p.p
      |ORDER BY p.p""".stripMargin

  /** Interleave the low 16 bits of two int columns into a 32-bit
    * Morton (Z-order) value — built as 16 unrolled shift/mask terms on
    * longs (disjoint bits, so + ≡ OR), all codegen-friendly built-ins,
    * no higher-order-function interpreter in the hot path. */
  private def zValue(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }

  /** K8: Z-order layout profile — Morton-interleave (l_partkey,
    * l_suppkey) and report the 64 top-level z-ranges (count + z span
    * each). This is the clustering key a 100 TB table would SORT BY so
    * a 2-D range predicate (part range × supplier range) prunes files
    * on BOTH dimensions instead of one: writing the fact table ordered
    * by z gives every file a tight min/max on both keys, and the
    * per-bucket counts here are exactly the file-size balance check an
    * operator runs before committing to the layout.
    *
    * Scale: one 64-group aggregate over a projection of the fact scan;
    * the z expression is pure per-row integer arithmetic inside
    * whole-stage codegen. */
  val k8Zorder: Q = (s, dir) => {
    Graft.table(s, dir, "lineitem")
      .select(zValue(col("l_partkey"), col("l_suppkey")).as("z"))
      .groupBy(shiftright(col("z"), 26).as("zbucket"))
      .agg(count(lit(1)).as("n"), min("z").as("z_min"), max("z").as("z_max"))
      .orderBy("zbucket")
  }

  val k8ZorderSql: String =
    """WITH z AS (
      |  SELECT CAST((SELECT SUM((((l_partkey >> i) & 1)::BIGINT << (2 * i))
      |                        + (((l_suppkey >> i) & 1)::BIGINT << (2 * i + 1)))
      |               FROM range(16) t(i)) AS BIGINT) AS z
      |  FROM lineitem)
      |SELECT z >> 26 AS zbucket, COUNT(*) AS n, MIN(z) AS z_min, MAX(z) AS z_max
      |FROM z
      |GROUP BY 1
      |ORDER BY zbucket""".stripMargin

  def queries: Map[String, Q] = Map(
    "e1_skew_profile" -> e1SkewProfile,
    "e2_hist_quantile" -> e2HistQuantile,
    "k8_zorder" -> k8Zorder,
  )

  def oracle: Map[String, String] = Map(
    "e1_skew_profile" -> e1SkewProfileSql,
    "e2_hist_quantile" -> e2HistQuantileSql,
    "k8_zorder" -> k8ZorderSql,
  )
}
