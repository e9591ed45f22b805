package graft

import graft.align.AsOfJoin
import graft.scale.Skew
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the most recent build row at-or-before, per key") {
    val probe = Seq((1L, "A", 5L, 1.0), (2L, "A", 15L, 2.0), (3L, "A", 30L, 3.0),
      (4L, "B", 8L, 4.0), (5L, "B", 9L, 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val build = Seq(("A", 0L, 100.0), ("A", 10L, 110.0), ("A", 30L, 130.0),
      ("B", 9L, 200.0))
      .toDF("user_id", "bar_ts", "close")
    val got = AsOfJoin.asof(probe, build, Seq("user_id"), "ts", "bar_ts", Seq("close"))
      .select("event_id", "close").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(100.0))  // ts=5 -> bar at 0
    assert(got(2L).contains(110.0))  // ts=15 -> bar at 10
    assert(got(3L).contains(130.0))  // tie: at-or-before includes ts=30
    assert(got(4L).isEmpty)          // B@8: no bar yet -> null
    assert(got(5L).contains(200.0))  // tie at 9
  }

  test("as-of join works when probe and build share the time column name") {
    val probe = Seq((1L, "A", 5L), (2L, "A", 15L))
      .toDF("event_id", "user_id", "ts")
    val build = Seq(("A", 0L, 100.0), ("A", 10L, 110.0))
      .toDF("user_id", "ts", "close")
    val got = AsOfJoin.asof(probe, build, Seq("user_id"), "ts", "ts", Seq("close"))
    assert(got.columns.toSeq == Seq("event_id", "user_id", "ts", "close"))
    val m = got.select("event_id", "ts", "close")
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m(1L) == (5L, Some(100.0)))   // probe ts survives intact
    assert(m(2L) == (15L, Some(110.0)))
  }

  test("forward as-of join picks the earliest build row at-or-after, per key") {
    val probe = Seq((1L, "A", 5L), (2L, "A", 10L), (3L, "A", 31L),
      (4L, "B", 8L), (5L, "B", 10L))
      .toDF("event_id", "user_id", "ts")
    val build = Seq(("A", 0L, 100.0), ("A", 10L, 110.0), ("A", 30L, 130.0),
      ("B", 9L, 200.0))
      .toDF("user_id", "bar_ts", "close")
    val got = AsOfJoin.asofForward(probe, build, Seq("user_id"), "ts", "bar_ts", Seq("close"))
      .select("event_id", "close").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(110.0))  // ts=5 -> next bar at 10
    assert(got(2L).contains(110.0))  // tie: at-or-after includes ts=10
    assert(got(3L).isEmpty)          // ts=31: nothing later -> null
    assert(got(4L).contains(200.0))  // B@8 -> bar at 9
    assert(got(5L).isEmpty)          // B@10: nothing later
  }

  test("as-of join breaks equal-timestamp build ties deterministically") {
    val probe = Seq((1L, "A", 10L)).toDF("event_id", "user_id", "ts")
    val build = Seq(("A", 10L, 1.0), ("A", 10L, 2.0), ("A", 10L, 3.0))
      .toDF("user_id", "bar_ts", "close")
    val picks = (1 to 5).map { _ =>
      AsOfJoin.asof(probe, build.repartition(7), Seq("user_id"), "ts", "bar_ts", Seq("close"))
        .select("close").as[Double].head()
    }
    assert(picks.distinct.size == 1) // same winner regardless of partitioning
  }

  test("salted aggregation equals the direct groupBy") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(2000)(("k" + rnd.nextInt(3), rnd.nextInt(100)))
      .toDF("k", "v")
      .withColumn("v_dec", col("v").cast("decimal(18,2)"))
    val direct = df.groupBy("k")
      .agg(sum(col("v_dec")).cast("double").as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    val salted = Skew.saltedSumCount(df, Seq("k"), "v_dec", 8)
      .select(col("k"), col("sum_v_dec").cast("double"), col("count"))
      .orderBy("k").as[(String, Double, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("salted join equals the plain join, including keys missing from the build side") {
    val rnd = new scala.util.Random(7)
    // skewed fact: key 0 carries half the rows; key 99 has no build row
    val fact = Seq.fill(3000)((if (rnd.nextBoolean()) 0L else 1L + rnd.nextInt(5), rnd.nextInt(100)))
      .map { case (k, v) => (if (v == 0) 99L else k, v) }
      .toDF("k", "v")
    val build = (0L to 5L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = fact.join(build, Seq("k"))
      .groupBy("k", "name").agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(Long, String, Long, Long)].collect().toSeq
    val salted = Skew.saltedJoin(fact, build, "k", 8)
      .groupBy("k", "name").agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .orderBy("k").as[(Long, String, Long, Long)].collect().toSeq
    assert(salted == plain)
  }
}
