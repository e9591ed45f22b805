package graft.operators

import graft.Graft
import graft.Graft.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse-maintenance operators: slowly-changing-dimension interval
  * construction, full-outer reconciliation, and session path rollups.
  * The "keep two systems honest" layer — CDC folding, snapshot
  * reconciliation — plus the path analytics that sit on top of
  * sessionization.
  *
  * Scale shapes: SCD2 is one window per entity (change points only —
  * the output is the CHANGE stream, never an event-grain copy);
  * reconciliation is two small keyed aggregates full-outer-joined on a
  * day spine; paths reuse the sessionizer's single series shuffle. */
object WarehouseQueries {

  /** SCD2 interval build — fold each user's event-type stream into
    * [valid_from, valid_to) validity intervals, one row per CHANGE
    * (type-2 dimension history from a CDC stream). valid_to of the
    * open interval is null (`is_current`). Timestamps in µs to match
    * the oracle's TIMESTAMP granularity (s2's convention). */
  val qScd2Intervals: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
    val ev = Graft.table(s, dir, "events")
      .select("event_id", "user_id", "event_type", "ts")
      .withColumn("tsu", expr("ts div 1000")) // ns -> µs, the oracle's TIMESTAMP grain
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
    ev.filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_from_us", col("tsu"))
      .withColumn("valid_to_us", lead(col("tsu"), 1).over(
        Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))))
      .withColumn("is_current", col("valid_to_us").isNull.cast("long"))
      .select("user_id", "event_type", "valid_from_us", "valid_to_us", "is_current")
      .orderBy("user_id", "valid_from_us")
  }

  val qScd2IntervalsSql: String =
    """WITH o AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
      |    lag(event_type) OVER w AS prev_type
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |c AS (
      |  SELECT user_id, event_id, event_type, tsu
      |  FROM o WHERE prev_type IS NULL OR prev_type <> event_type)
      |SELECT user_id, event_type, tsu AS valid_from_us,
      |  lead(tsu) OVER w AS valid_to_us,
      |  CAST(CASE WHEN lead(tsu) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM c
      |WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
      |ORDER BY user_id, valid_from_us""".stripMargin

  /** Full-outer reconciliation — daily click counts vs daily view
    * counts, FULL OUTER joined on the day so a day present on only one
    * side still emits (the join shape every snapshot-diff job needs;
    * nothing else in the catalog exercises full-outer). */
  val qFullOuterRecon: Q = (s, dir) => {
    val ev = Graft.table(s, dir, "events")
      .withColumn("day", to_date(expr("timestamp_micros(ts div 1000)")))
    def side(t: String, name: String) = ev.filter(col("event_type") === t)
      .groupBy("day").agg(count(lit(1)).as(name))
    side("click", "n_clicks")
      .join(side("view", "n_views"), Seq("day"), "full_outer")
      .na.fill(0L, Seq("n_clicks", "n_views"))
      .select(col("day"), col("n_clicks").cast("long").as("n_clicks"),
        col("n_views").cast("long").as("n_views"),
        (col("n_clicks") - col("n_views")).cast("long").as("diff"))
      .orderBy("day")
  }

  val qFullOuterReconSql: String =
    """WITH c AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_clicks
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |v AS (
      |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_views
      |  FROM events WHERE event_type = 'view' GROUP BY 1)
      |SELECT day,
      |  CAST(COALESCE(n_clicks, 0) AS BIGINT) AS n_clicks,
      |  CAST(COALESCE(n_views, 0) AS BIGINT) AS n_views,
      |  CAST(COALESCE(n_clicks, 0) - COALESCE(n_views, 0) AS BIGINT) AS diff
      |FROM c FULL OUTER JOIN v USING (day)
      |ORDER BY day""".stripMargin

  /** F8: top session paths — 30-minute-gap sessions (s2's boundary
    * rule), each session summarized by its first three event types
    * joined with '>', counted across the corpus, top 20. The
    * "what do sessions look like" rollup on top of sessionization:
    * same single series shuffle, then one small keyed count. */
  val f8TopPaths: Q = (s, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("tsu"), col("event_id"))
    val gapUs = 30L * 60 * 1000 * 1000
    val ev = Graft.table(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000").as("tsu"))
      .withColumn("prev", lag(col("tsu"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("tsu") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val inSess = Window.partitionBy("user_id", "session_id")
      .orderBy(col("tsu"), col("event_id"))
    // the path is rebuilt from positional maxes, not collect_list —
    // collect_list order inside a groupBy is nondeterministic
    val pathsDet = ev.withColumn("rn", row_number().over(inSess))
      .filter(col("rn") <= 3)
      .groupBy("user_id", "session_id")
      .agg(concat_ws(">",
        max(when(col("rn") === 1, col("event_type"))),
        max(when(col("rn") === 2, col("event_type"))),
        max(when(col("rn") === 3, col("event_type")))).as("path"))
    pathsDet.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  val f8TopPathsSql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, event_type, tsu,
      |    CASE WHEN prev IS NULL OR tsu - prev > 1800000000 THEN 1 ELSE 0 END AS ns
      |  FROM g),
      |sid AS (
      |  SELECT user_id, event_id, event_type, tsu,
      |    SUM(ns) OVER (PARTITION BY user_id ORDER BY tsu, event_id
      |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM m),
      |rn AS (
      |  SELECT user_id, session_id, event_type,
      |    row_number() OVER (PARTITION BY user_id, session_id
      |                       ORDER BY tsu, event_id) AS rn
      |  FROM sid),
      |p AS (
      |  SELECT user_id, session_id,
      |    concat_ws('>',
      |      MAX(CASE WHEN rn = 1 THEN event_type END),
      |      MAX(CASE WHEN rn = 2 THEN event_type END),
      |      MAX(CASE WHEN rn = 3 THEN event_type END)) AS path
      |  FROM rn WHERE rn <= 3 GROUP BY 1, 2)
      |SELECT path, COUNT(*) AS n_sessions
      |FROM p GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  def queries: Map[String, Q] = Map(
    "q_scd2_intervals" -> qScd2Intervals,
    "q_full_outer_recon" -> qFullOuterRecon,
    "f8_top_paths" -> f8TopPaths,
  )

  def oracle: Map[String, String] = Map(
    "q_scd2_intervals" -> qScd2IntervalsSql,
    "q_full_outer_recon" -> qFullOuterReconSql,
    "f8_top_paths" -> f8TopPathsSql,
  )
}
