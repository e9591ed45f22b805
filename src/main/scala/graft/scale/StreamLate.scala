package graft.scale

import graft.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Replica-scale late-data / out-of-order replay: make watermark drops
  * ACTUALLY happen across micro-batch boundaries, then reconcile the
  * stream's dropped-row accounting row-for-row against a batch oracle.
  *
  * Arrival model: the s10 late-data audit's displacement rule
  * (event_id % 10 = 3 ⇒ late) applied to a time-ordered stream — each
  * marked row ARRIVES `displaceS` seconds of stream time after its
  * event time (arr = ts + displaceS), everything else arrives in event
  * order. Files are range-partitioned on the arrival axis and replayed
  * one per trigger, so a displaced row whose event time predates an
  * earlier batch's watermark is genuinely late ACROSS a batch boundary.
  *
  * Stream under test: event-time dedup (`dropDuplicates(event_id,
  * event_time)` + watermark `delayS`) — the stateful op whose
  * late-drop semantics are exactly batch-simulable: Spark's watermark
  * before batch b is (max event-time over batches < b, floored to ms)
  * − delay, and a row drops iff its event time is not later than it.
  * The batch twin replays that rule per batch (file order = batch
  * order = arrival order by construction) and the harness requires:
  *   1. stream drop count == batch-simulated drop count (exact, via
  *      the per-batch numRowsDroppedByWatermark metrics),
  *   2. the sink table == the batch-simulated survivor set (exceptAll
  *      empty both ways — so the counts can't pass by coincidence),
  *   3. every dropped row is s10-displaced (drops ⊆ the late set the
  *      catalog's s10 audit bands), and
  *   4. drops > 0 — a replay that never crossed a boundary proves
  *      nothing and fails loudly.
  *
  * Usage: runMain graft.scale.StreamLate <sfDir> [files=256] [delayS=60] [displaceS=300]
  */
object StreamLate {

  private def jq(s: String): String = "\"" + s + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nFiles = if (args.length > 1) args(1).toInt else 256
    val delayS = if (args.length > 2) args(2).toLong else 60L
    val displaceS = if (args.length > 3) args(3).toLong else 300L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val replayDir = "target/tmp/late_replay"
    val base = s"target/tmp/late_${System.nanoTime()}"

    // --- Arrival-ordered replay corpus.
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(replayDir))
    val ev = Graft.table(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("tsu"), // µs — the timestamp grid Spark sees
        (col("ts") + when(col("event_id") % 10 === 3, displaceS * 1000000000L)
          .otherwise(0L)).as("arr"))
    ev.repartitionByRange(nFiles, col("arr"))
      .sortWithinPartitions("arr")
      .write.mode("overwrite").parquet(replayDir)
    val parts = new java.io.File(replayDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val mbase = System.currentTimeMillis() - parts.length * 2000L
    parts.zipWithIndex.foreach { case (f, i) => f.setLastModified(mbase + i * 2000L) }
    val total = spark.read.parquet(replayDir).count()
    System.err.println(s"[stream-late] corpus: $total rows, ${parts.length} files")

    // --- Stream: event-time dedup with a watermark, one file per batch.
    @volatile var streamDrops = 0L
    @volatile var batches = 0L
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        batches += 1
        streamDrops += e.progress.stateOperators
          .map(_.numRowsDroppedByWatermark).sum
      }
    }
    spark.streams.addListener(listener)
    val sch = spark.read.parquet(replayDir).schema
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
      .parquet(replayDir)
      .withColumn("event_time", timestamp_micros(col("tsu")))
      .withWatermark("event_time", s"$delayS seconds")
      .dropDuplicates("event_id", "event_time")
      .select("event_id", "tsu")
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ck")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(listener)

    // --- Batch oracle: replay the watermark rule per batch. File order
    // is arrival order (range partition + staggered mtimes), one file
    // per batch; watermark for batch b = floor-to-ms of the max event
    // time over batches < b, minus the delay.
    val byFile = spark.read.parquet(replayDir)
      .withColumn("file", input_file_name())
    val fileOrder = parts.map(f => f.toURI.toString).zipWithIndex.toMap
    val fo = spark.sparkContext.broadcast(fileOrder)
    import spark.implicits._
    val withBatch = byFile.select(col("event_id"), col("tsu"), col("file"))
      .as[(Long, Long, String)]
      .map { case (id, tsu, f) => (id, tsu, fo.value(f)) }
      .toDF("event_id", "tsu", "batch")
    val maxPerBatch = withBatch.groupBy("batch").agg(max("tsu").as("mx"))
      .orderBy("batch").as[(Int, Long)].collect()
    val wmUs = new Array[Long](maxPerBatch.length)
    var cummax = Long.MinValue
    for ((b, mx) <- maxPerBatch) {
      wmUs(b) = if (cummax == Long.MinValue) Long.MinValue
        else (cummax / 1000 - delayS * 1000L) * 1000L
      cummax = math.max(cummax, mx)
    }
    val wmB = spark.sparkContext.broadcast(wmUs)
    val survived = withBatch.filter { r =>
      val wm = wmB.value(r.getAs[Int]("batch"))
      wm == Long.MinValue || r.getAs[Long]("tsu") > wm
    }
    val dropped = withBatch.filter { r =>
      val wm = wmB.value(r.getAs[Int]("batch"))
      wm != Long.MinValue && r.getAs[Long]("tsu") <= wm
    }
    val simDrops = dropped.count()
    // every dropped row must be one the s10 displacement rule marked late
    val droppedOnTime = dropped.filter(col("event_id") % 10 =!= 3).count()

    val out = spark.read.parquet(s"$base/out").select("event_id", "tsu")
    val outN = out.count()
    val aMinusB = out.exceptAll(survived.select("event_id", "tsu")).count()
    val bMinusA = survived.select("event_id", "tsu").exceptAll(out).count()
    val identical = streamDrops == simDrops && aMinusB == 0 && bMinusA == 0 &&
      outN + streamDrops == total
    val nonVacuous = streamDrops > 0 && droppedOnTime == 0

    println(s"""{"metric":"stream_late","sf_dir":${jq(sfDir)},""" +
      s""""total_rows":$total,"files":${parts.length},"batches":$batches,""" +
      s""""delay_s":$delayS,"displace_s":$displaceS,""" +
      s""""displaced_rows":${spark.read.parquet(replayDir)
        .filter(col("event_id") % 10 === 3).count()},""" +
      s""""stream_dropped":$streamDrops,"sim_dropped":$simDrops,""" +
      s""""dropped_non_displaced":$droppedOnTime,""" +
      s""""out_rows":$outN,"out_minus_sim":$aMinusB,"sim_minus_out":$bMinusA,""" +
      s""""identical":$identical,"nonzero_drops":$nonVacuous,""" +
      s""""wall_s":${f"$wall%.2f"}}""")
    if (!identical || !nonVacuous) sys.exit(1)
    spark.stop()
  }
}
