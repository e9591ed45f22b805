package graft.scale

// Rep-variance diagnostic: run ONE catalog query `reps` times in one JVM
// (bench convention: blocking release between reps) and, for every rep,
// print the wall plus the top per-stage task-time aggregates attributed
// to that rep — enough to see WHICH stage a slow rep spends its extra
// time in (same-plan GC/scheduling noise vs a different/worse plan).
// Found for r13: d10_edit_neighbors reps swing 5 s → 45 s inside one
// idle-host JVM; the per-rep stage attribution is how the cause was
// localized rather than guessed.
import graft.{Graft, SparkEntry}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

object RepProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var builder = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    // A/B hook: SPARK_GRAFT_CONF="k=v;k2=v2" overlays session confs (the
    // builder is last-write-wins), so a hypothesis can be tested without
    // recompiling.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder = builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(var n: Int = 0, var run: Double = 0, var gc: Double = 0,
      var cpu: Double = 0, var maxRun: Double = 0, var ends: String = "")
    val stages = scala.collection.mutable.Map[Int, St]()
    val names = scala.collection.mutable.Map[Int, String]()
    val jobEnds = scala.collection.mutable.ArrayBuffer[String]()
    val stageAttempts = scala.collection.mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val m = e.taskMetrics
        if (m != null) {
          val s = stages.getOrElseUpdate(e.stageId, St())
          s.n += 1; s.run += m.executorRunTime / 1e3; s.gc += m.jvmGCTime / 1e3
          s.cpu += m.executorCpuTime / 1e9
          s.maxRun = s.maxRun.max(m.executorRunTime / 1e3)
          val r = e.reason.toString.take(20)
          if (r != "Success") s.ends += s" $r"
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        names(e.stageInfo.stageId) =
          e.stageInfo.rddInfos.flatMap(_.scope.map(_.name)).distinct.mkString("|")
        stageAttempts(e.stageInfo.stageId) =
          stageAttempts.getOrElse(e.stageInfo.stageId, 0) + 1
        e.stageInfo.failureReason.foreach(r =>
          jobEnds += s"STAGEFAIL ${e.stageInfo.stageId}: ${r.take(120)}")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
        e.jobResult match {
          case org.apache.spark.scheduler.JobSucceeded => ()
          case r => jobEnds += s"JOBEND ${e.jobId}: ${r.toString.take(160)}"
        }
      }
    })
    // executed-plan capture (final AQE plan): written per rep so slow and
    // fast reps of the same query can be diffed for plan flips.
    val lastPlan = new java.util.concurrent.atomic.AtomicReference[String]("")
    val lastQe = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.execution.QueryExecution](null)
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        lastPlan.set(qe.executedPlan.toString)
        lastQe.set(qe)
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    // Per-operator metric dump (duration/time metrics + row counts) for
    // the final executed plan of the rep — localizes WHICH operator a
    // slow rep burns its extra CPU in when the plan shape is identical.
    def metricLines(qe: org.apache.spark.sql.execution.QueryExecution): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
        val interesting = p.metrics.filter { case (k, m) =>
          k.toLowerCase.contains("time") || k.toLowerCase.contains("duration") ||
            k == "numOutputRows" }
        if (interesting.nonEmpty) {
          val s = interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
          out += f"${p.nodeName.take(40)}%-40s $s"
        }
        p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
          case r: org.apache.spark.sql.execution.InputAdapter => walk(r.child)
          case w: org.apache.spark.sql.execution.WholeStageCodegenExec => walk(w.child)
          case o => o.children.foreach(walk)
        }
      }
      walk(qe.executedPlan)
      out.toSeq
    }
    val q = SparkEntry.queries(name)
    // Janino compilation counters (CodegenMetrics is the object Spark's
    // CodeGenerator.compile updates on every cache MISS): per-rep deltas
    // say whether the codegen class cache is actually hitting across reps
    // of the same query, or every rep recompiles fresh sources.
    val cgm = org.apache.spark.metrics.source.CodegenMetrics
    def cgCount: Long = cgm.METRIC_COMPILATION_TIME.getCount
    def cgTimeMs: Long = cgm.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000
    var prevCg = cgCount
    (1 to reps).foreach { i =>
      stages.clear(); names.clear(); jobEnds.clear(); stageAttempts.clear()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Graft.releaseMaterialized(spark, blocking = true)
      Thread.sleep(300)
      val cgNow = cgCount
      val top = stages.toSeq.sortBy(-_._2.run).take(8)
      println(f"REP $i wall=$wall%7.2f s  sumRun=${stages.values.map(_.run).sum}%8.1f sumGc=${stages.values.map(_.gc).sum}%7.1f sumCpu=${stages.values.map(_.cpu).sum}%8.1f cgCompiles=${cgNow - prevCg}")
      prevCg = cgNow
      top.foreach { case (sid, s) =>
        val att = stageAttempts.getOrElse(sid, 0)
        println(f"    stage=$sid%-5d n=${s.n}%-4d att=$att run=${s.run}%8.1f gc=${s.gc}%6.1f cpu=${s.cpu}%8.1f maxTask=${s.maxRun}%7.1f${s.ends}  ${names.getOrElse(sid, "?").take(120)}")
      }
      jobEnds.foreach(j => println(s"    $j"))
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f"/tmp/repplan_$name%s_$i%02d.txt"), lastPlan.get())
        if (lastQe.get() != null) java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f"/tmp/repmetrics_$name%s_$i%02d.txt"),
          metricLines(lastQe.get()).mkString("\n"))
      } catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
