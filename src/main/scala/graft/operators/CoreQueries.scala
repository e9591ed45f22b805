package graft.operators

import graft.Graft
import graft.Graft.Q
import org.apache.spark.sql.functions._

/** Core relational surface: scan → filter → project → hash-agg →
  * joins → top-K. Mirrors the reference's aggregation/sort/top-K operators
  * (SURVEY.md §2.4 A1-A3, §2.6 K1-K6) expressed over the TPC-H-ish harness
  * tables.
  *
  * Numeric policy for oracle parity (shared by every module): exact-sum
  * through decimal (accumulation-order-independent, so identical between
  * Spark's parallel partial aggregates and DuckDB's single-node sum), and
  * `round(x, 6)` on any float whose computation is per-row or
  * variance-like (cross-engine libm differences live far below 1e-6).
  * Two refinements the sf1 replica gate forced (SCALE_r07.md §1):
  * money/quantity PRODUCTS are computed IN decimal from the exact
  * ≤2-decimal inputs — `CAST(double_product AS DECIMAL)` leaves each row
  * at the mercy of the engines' double→decimal boundary rounding — and
  * displayed floats that can land on a rounding half-boundary prefer the
  * `floor(x*1e6 + 0.5)/1e6` grid over `round(x, 6)` (Spark rounds the
  * exact binary expansion, DuckDB a float multiply; the floor grid is
  * the identical IEEE chain on both). Existing `round(,6)` pairs on
  * bounded per-row floats are kept (boundary hits there need the
  * unrounded doubles to already be bit-identical AND sitting exactly on
  * a half-ULP — the scale gate is the detector if one ever appears).
  *
  * Scale notes: all aggregations here are partial-aggregate friendly
  * (map-side combine before the shuffle); top-K compiles to
  * TakeOrderedAndProject (no global sort); the only full shuffle is the
  * groupBy key exchange, which is unavoidable and key-partitioned.
  */
object CoreQueries {

  /** TPC-H Q1-style pricing summary (reference A1/A2/A3 analogue:
    * single-key groupBy with mean/sum — algorithms/technical.py:27-97). */
  val q1Agg: Q = (s, dir) => {
    val li = Graft.table(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
        sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))).cast("double").as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM((CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS sum_disc_price,
      | ROUND(AVG(l_quantity), 6) AS avg_qty,
      | ROUND(AVG(l_discount), 6) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Three-way join + agg (customer ⋈ orders ⋈ lineitem), revenue per
    * order: the engine's general equi-join surface (SURVEY.md §2.3 notes the
    * reference only ever equi-joins on date; the harness exercises the
    * general case). Orders/customer side is pre-filtered before the join so
    * the build side stays small; at cluster scale Catalyst broadcast-joins
    * customer and shuffle-joins lineitem on l_orderkey.
    */
  val q3Join: Q = (s, dir) => {
    val cust = Graft.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Graft.table(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val li = Graft.table(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey")
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey,
      | CAST(SUM((CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Multi-way dim join through nation → region (broadcast chain) with
    * revenue per nation. */
  val q5Nation: Q = (s, dir) => {
    val li = Graft.table(s, dir, "lineitem")
    val sup = Graft.table(s, dir, "supplier")
    val nat = Graft.table(s, dir, "nation")
    val reg = Graft.table(s, dir, "region")
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      // Exact-decimal PRODUCT, not a decimal cast of the double product:
      // both inputs are exact 2-decimal values, so the whole sum is
      // exact and engine-independent — casting the double product to
      // decimal instead leaves each row at the mercy of the engines'
      // double→decimal boundary rounding, which diverged at sf1.
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  val q5NationSql: String =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |          * (1.00 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  /** Semi/anti join surface: customers with no open orders
    * (reference has no anti-join; harness coverage for the engine). */
  val qAntiJoin: Q = (s, dir) => {
    val cust = Graft.table(s, dir, "customer")
    val open = Graft.table(s, dir, "orders").filter(col("o_orderstatus") === "O")
    cust.join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** K4: top-N by measure with partial selection — reference
    * main.py:216-267 (top-15 by volume, then re-sorted ascending). Spark
    * plans orderBy().limit() as TakeOrderedAndProject: per-partition heaps,
    * no global sort — exactly the reference's selection-of-max intent, but
    * distributed. Tie-broken on orderkey for determinism.
    */
  val kTopVolume: Q = (s, dir) => {
    Graft.table(s, dir, "orders")
      .filter(col("o_totalprice") > 0)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
      .select(col("o_orderkey"), round(col("o_totalprice"), 6).as("o_totalprice"),
        col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey"))
  }

  val kTopVolumeSql: String =
    """SELECT o_orderkey, ROUND(o_totalprice, 6) AS o_totalprice, o_orderstatus
      |FROM (SELECT * FROM orders WHERE o_totalprice > 0
      |      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15)
      |ORDER BY o_totalprice ASC, o_orderkey""".stripMargin

  /** K1/K2: multi-criteria sort (date asc, price asc — reference
    * main.py:139-169's composite key) over a filtered scan; all 12 reference
    * sort algorithms collapse to this one orderBy (SURVEY.md §2.6 K1).
    */
  val kMultiKeySort: Q = (s, dir) => {
    Graft.table(s, dir, "lineitem")
      .filter(col("l_quantity") > 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast("date").as("ship_day"),
        round(col("l_extendedprice"), 6).as("price"))
      .orderBy(col("ship_day").asc, col("price").asc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  val kMultiKeySortSql: String =
    """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day,
      | ROUND(l_extendedprice, 6) AS price
      |FROM lineitem
      |WHERE l_quantity > 0
      |ORDER BY ship_day ASC, price ASC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin

  /** K2: the reference's multi-criteria integer sort key for
    * non-comparative sorts (main.py:139-169) — bit-parity encoding
    * (date-compact·1e5 + value-cents), ordered by the key alone. */
  val k2MultikeyEncoded: Q = (s, dir) => {
    val li = Graft.table(s, dir, "lineitem")
      .withColumn("ship_day", col("l_shipdate").cast("date"))
    li.withColumn("sort_key",
      graft.sortbench.Sorting.multiKeyDateClose(col("ship_day"), col("l_quantity")))
      .select(col("l_orderkey"), col("l_linenumber"), col("sort_key"))
      .orderBy(col("sort_key"), col("l_orderkey"), col("l_linenumber"))
      .limit(50)
  }

  val k2MultikeyEncodedSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  ((year(CAST(l_shipdate AS DATE)) - 2000) * 366 +
      |   (month(CAST(l_shipdate AS DATE)) - 1) * 31 +
      |   day(CAST(l_shipdate AS DATE))) * 100000
      |  + CAST(ROUND(l_quantity * 100) AS BIGINT) AS sort_key
      |FROM lineitem
      |ORDER BY sort_key, l_orderkey, l_linenumber
      |LIMIT 50""".stripMargin

  /** U1: union + distinct (the reference's master-calendar set union,
    * etl/data_unifier.py:46-55) over the two date-bearing fact tables. */
  val uUnionDistinct: Q = (s, dir) => {
    val a = Graft.table(s, dir, "orders").select(col("o_orderdate").cast("date").as("d"))
    val b = Graft.table(s, dir, "lineitem").select(col("l_shipdate").cast("date").as("d"))
    a.union(b).distinct().orderBy("d")
  }

  val uUnionDistinctSql: String =
    """SELECT DISTINCT d FROM (
      |  SELECT CAST(o_orderdate AS DATE) AS d FROM orders
      |  UNION ALL
      |  SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem)
      |ORDER BY d""".stripMargin

  /** As-of join: each event gains the daily bar close most recently
    * at-or-before its timestamp (union+ffill pattern — align.AsOfJoin;
    * the oracle uses DuckDB's native ASOF JOIN). */
  val qAsofJoin: Q = (s, dir) => {
    val bars = PatternQueries.dailyBars(s, dir)
      .select(col("user_id"),
        (expr("unix_date(day)").cast("long") * 86400L * 1000000000L).as("bar_ts"),
        col("close"))
    val probe = Graft.events(s, dir)
    graft.align.AsOfJoin.asof(probe, bars, Seq("user_id"), "ts", "bar_ts", Seq("close"))
      .select(col("event_id"), col("user_id"), round(col("close"), 6).as("asof_close"))
      .orderBy("user_id", "event_id")
  }

  val qAsofJoinSql: String =
    """WITH bars AS (
      |  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
      |         arg_max(value, ts) AS close
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))
      |SELECT e.event_id, e.user_id, ROUND(b.close, 6) AS asof_close
      |FROM events e ASOF JOIN bars b
      |  ON e.user_id = b.user_id AND e.ts >= b.day_ts
      |ORDER BY e.user_id, e.event_id""".stripMargin

  /** Forward as-of join: each event gains the close of the EARLIEST
    * daily bar at-or-after its timestamp (next-day-open direction).
    * Inner semantics: events after their series' last bar have no
    * forward match and are dropped, mirroring the oracle's native
    * forward ASOF JOIN. */
  val qAsofForward: Q = (s, dir) => {
    val bars = PatternQueries.dailyBars(s, dir)
      .select(col("user_id"),
        (expr("unix_date(day)").cast("long") * 86400L * 1000000000L).as("bar_ts"),
        col("close"))
    val probe = Graft.events(s, dir)
    graft.align.AsOfJoin.asofForward(probe, bars, Seq("user_id"), "ts", "bar_ts", Seq("close"))
      .filter(col("close").isNotNull)
      .select(col("event_id"), col("user_id"), round(col("close"), 6).as("next_close"))
      .orderBy("user_id", "event_id")
  }

  val qAsofForwardSql: String =
    """WITH bars AS (
      |  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day_ts,
      |         arg_max(value, ts) AS close
      |  FROM events GROUP BY user_id, CAST(ts AS DATE))
      |SELECT e.event_id, e.user_id, ROUND(b.close, 6) AS next_close
      |FROM events e ASOF JOIN bars b
      |  ON e.user_id = b.user_id AND e.ts <= b.day_ts
      |ORDER BY e.user_id, e.event_id""".stripMargin

  /** Salted two-phase aggregation (skew path) — must equal the direct
    * groupBy; decimal partials keep the sum associative-exact. */
  val qSaltedAgg: Q = (s, dir) => {
    val li = Graft.table(s, dir, "lineitem")
      .withColumn("price_dec", col("l_extendedprice").cast("decimal(18,4)"))
    graft.scale.Skew.saltedSumCount(li, Seq("l_returnflag"), "price_dec", 16)
      .select(col("l_returnflag"),
        col("sum_price_dec").cast("double").as("sum_price"), col("count"))
      .orderBy("l_returnflag")
  }

  val qSaltedAggSql: String =
    """SELECT l_returnflag,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
      | COUNT(*) AS count
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Salted replicate JOIN (join-side skew path) — revenue per supplier
    * nation through a salted lineitem⋈supplier join; must equal the
    * plain join, which is exactly what the oracle computes. */
  val qSaltedJoin: Q = (s, dir) => {
    val li = Graft.table(s, dir, "lineitem")
      .select(col("l_suppkey").as("s_suppkey"),
        col("l_extendedprice").cast("decimal(18,4)").as("price_dec"))
    val sup = Graft.table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    graft.scale.Skew.saltedJoin(li, sup, "s_suppkey", 8)
      .groupBy("s_nationkey")
      .agg(sum(col("price_dec")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("s_nationkey")
  }

  val qSaltedJoinSql: String =
    """SELECT s_nationkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  /** Distinct counting (exact; the approx_count_distinct sketch path is
    * available but not oracle-comparable across engines). */
  val qDistinctCount: Q = (s, dir) =>
    Graft.table(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  val qDistinctCountSql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      | COUNT(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Hierarchical aggregation via ROLLUP (region → nation → total):
    * grouping-set coverage the reference lacks but the harness provides
    * for free (SURVEY.md §2.4 note). */
  val qRollup: Q = (s, dir) => {
    // via spark.sql: the Dataset rollup API trips Spark's ambiguous-
    // self-join check on the Expand node after a join chain; the SQL
    // front-end resolves cleanly (and exercises the engine's SQL surface).
    Graft.table(s, dir, "lineitem").createOrReplaceTempView("li_v")
    Graft.table(s, dir, "supplier").createOrReplaceTempView("sup_v")
    Graft.table(s, dir, "nation").createOrReplaceTempView("nat_v")
    Graft.table(s, dir, "region").createOrReplaceTempView("reg_v")
    s.sql(
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | COUNT(*) AS n
        |FROM li_v
        |JOIN sup_v ON l_suppkey = s_suppkey
        |JOIN nat_v ON s_nationkey = n_nationkey
        |JOIN reg_v ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
  }

  val qRollupSql: String =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      | COUNT(*) AS n
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_asof_join" -> qAsofJoin,
    "q_asof_forward" -> qAsofForward,
    "q_salted_agg" -> qSaltedAgg,
    "q_salted_join" -> qSaltedJoin,
    "q_distinct_count" -> qDistinctCount,
    "q_rollup" -> qRollup,
    "q1_agg" -> q1Agg,
    "q3_join" -> q3Join,
    "q5_nation" -> q5Nation,
    "q_anti_join" -> qAntiJoin,
    "k_top_volume" -> kTopVolume,
    "k_multikey_sort" -> kMultiKeySort,
    "k2_multikey_encoded" -> k2MultikeyEncoded,
    "u_union_distinct" -> uUnionDistinct,
  )

  def oracle: Map[String, String] = Map(
    "q_asof_join" -> qAsofJoinSql,
    "q_asof_forward" -> qAsofForwardSql,
    "q_salted_agg" -> qSaltedAggSql,
    "q_salted_join" -> qSaltedJoinSql,
    "q_distinct_count" -> qDistinctCountSql,
    "q_rollup" -> qRollupSql,
    "k2_multikey_encoded" -> k2MultikeyEncodedSql,
    "q1_agg" -> q1AggSql,
    "q3_join" -> q3JoinSql,
    "q5_nation" -> q5NationSql,
    "q_anti_join" -> qAntiJoinSql,
    "k_top_volume" -> kTopVolumeSql,
    "k_multikey_sort" -> kMultiKeySortSql,
    "u_union_distinct" -> uUnionDistinctSql,
  )
}
