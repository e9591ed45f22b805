package graft

import graft.align.Alignment
import graft.clean.Cleaning
import graft.ingest.ChartJson
import org.apache.spark.sql.functions._

/** FIXTURES.md §2.6 cleaning edge cases + §1.3 chart-JSON ingest. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("symbol")
  private val order = Seq(col("i"))

  test("forward fill: [10,None,None,15] -> [10,10,10,15]; leading None stays") {
    val df = Seq((0, "X", Some(10.0)), (1, "X", None), (2, "X", None),
      (3, "X", Some(15.0)), (0, "Y", None), (1, "Y", Some(5.0)))
      .toDF("i", "symbol", "close")
    val got = Cleaning.forwardFill(df, "close", keys, order)
      .orderBy("symbol", "i").select("close").as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(10.0), Some(10.0), Some(10.0), Some(15.0), None, Some(5.0)))
    val kept = Cleaning.dropInvalid(Cleaning.forwardFill(df, "close", keys, order))
    assert(kept.count() == 5) // leading null of Y dropped
  }

  test("inconsistencies flag the three anomaly types, skipping nulls") {
    val df = Seq(
      (0, 10.0, 9.0, 11.0, 10.0),   // high<low (also close outside)
      (1, 10.0, 12.0, 9.0, 13.0),   // close outside
      (2, 15.0, 12.0, 9.0, 10.0),   // open outside
      (3, 10.0, 12.0, 9.0, 11.0)    // clean
    ).toDF("i", "open", "high", "low", "close")
    val got = Cleaning.inconsistencies(df)
      .select("i", "anomaly_type").as[(Int, String)].collect().toSet
    assert(got.contains((0, "High_less_than_Low")))
    assert(got.contains((1, "Close_outside_Low_High_range")))
    assert(got.contains((2, "Open_outside_Low_High_range")))
    assert(!got.exists(_._1 == 3))
    val withNull = Seq((0, Option.empty[Double], Some(9.0), Some(11.0), Some(10.0)))
      .toDF("i", "open", "high", "low", "close")
    assert(!Cleaning.inconsistencies(withNull)
      .select("anomaly_type").as[String].collect()
      .contains("Open_outside_Low_High_range"))
  }

  test("affectedRows lists zero-based positions of rows with missing fields") {
    val df = Seq((0, "X", Some(1.0)), (1, "X", None), (2, "X", Some(3.0)),
      (3, "X", None)).toDF("i", "symbol", "close")
    val got = Cleaning.affectedRows(df, Seq("close"), Seq("symbol"), Seq(col("i")))
      .select("row_index").as[Int].collect().toSet
    assert(got == Set(1, 3))
  }

  test("missing report counts per-field nulls") {
    val df = Seq((Some(1.0), Option.empty[Double]), (None, Some(2.0)), (Some(3.0), Some(4.0)))
      .toDF("open", "close")
    val r = Cleaning.missingReport(df, Seq("open", "close")).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L && r.getLong(2) == 2L)
  }

  test("calendar alignment null-pads missing dates (disjoint+overlap)") {
    val bars = Seq(("2024-01-01", "A", 1.0), ("2024-01-02", "A", 2.0),
      ("2024-01-02", "B", 20.0), ("2024-01-03", "B", 30.0))
      .toDF("date", "symbol", "close")
    val aligned = Alignment.alignToCalendar(bars)
    assert(aligned.count() == 6) // 3 dates x 2 symbols
    val missing = aligned.filter(col("close").isNull)
      .select("date", "symbol").as[(String, String)].collect().toSet
    assert(missing == Set(("2024-01-03", "A"), ("2024-01-01", "B")))
    assert(Alignment.masterCalendar(bars).as[String].collect().toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
  }

  test("wideToLong melts sym_Field columns, discovering symbols from _Close") {
    val wide = Seq(("2024-01-01", 1.0, 2.0, 0.5, 1.5, 100L, 10.0, 20.0, 5.0, 15.0, 1000L))
      .toDF("Date", "A_Open", "A_High", "A_Low", "A_Close", "A_Volume",
        "B_Open", "B_High", "B_Low", "B_Close", "B_Volume")
    val long = Alignment.wideToLong(wide).orderBy("symbol")
    assert(long.columns.toSeq == Seq("date", "symbol", "open", "high", "low", "close", "volume"))
    val rows = long.as[(String, String, Double, Double, Double, Double, Long)].collect()
    assert(rows(0) == (("2024-01-01", "A", 1.0, 2.0, 0.5, 1.5, 100L)))
    assert(rows(1) == (("2024-01-01", "B", 10.0, 20.0, 5.0, 15.0, 1000L)))
  }

  test("chart JSON parse: rows zipped, short arrays null-padded, unix->date") {
    val json =
      """{"chart":{"result":[{"timestamp":[1704067200,1704153600],
        |"indicators":{"quote":[{"open":[380.0,381.5],"high":[382.0,383.0],
        |"low":[379.0,380.5],"close":[381.0],"volume":[1000000,1200000]}]}}]}}"""
        .stripMargin.replace("\n", "")
    val got = ChartJson.parseOne(spark, "VOO", json).orderBy("date")
    val rows = got.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[java.sql.Date]("date").toString == "2024-01-01")
    assert(rows(0).getAs[Double]("close") == 381.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("close"))) // padded to len(timestamp)
    assert(rows(1).getAs[Long]("volume") == 1200000L)
  }

  test("forwardFillScan: partitioned scan equals the windowed forward fill") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vals = (0 until 4000).map { i =>
      (i.toLong, i.toLong,
        if (rnd.nextDouble() < 0.3) None else Some(rnd.nextDouble() * 100))
    }
    val df = vals.toDF("event_id", "ts", "v").repartition(7)
    val scanned = Cleaning.forwardFillScan(df)
      .orderBy("event_id").select("v").as[Option[Double]].collect().toSeq
    val windowed = Cleaning.forwardFill(
        df.withColumn("k", org.apache.spark.sql.functions.lit(1)),
        "v", Seq("k"), Seq(col("ts"), col("event_id")))
      .orderBy("event_id").select("v").as[Option[Double]].collect().toSeq
    assert(scanned == windowed)
    // leading nulls preserved
    assert(vals.takeWhile(_._3.isEmpty).length ==
      scanned.takeWhile(_.isEmpty).length)
  }
}
