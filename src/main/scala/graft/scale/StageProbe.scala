package graft.scale

// Straggler diagnostic: run one catalog query and print per-stage
// task-time stats (n/median/max/ratio) + RDD-scope names, plus a
// SLOWTASK line per >15 s task with its input/shuffle record counts —
// enough to tell input-layout skew (uniform inRec, bimodal sec) from
// key skew (one task with the shuffle records) without the Spark UI.
// This is how r13 found d12's "Zipf skew" was really the nearCorpus
// two-branch union scheduling 5x-different per-task work in one stage.
import graft.{Graft, SparkEntry}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

object StageProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tasks = scala.collection.mutable.Map[Int, scala.collection.mutable.ArrayBuffer[Double]]()
    val names = scala.collection.mutable.Map[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        val m = e.taskMetrics
        if (m != null) {
          tasks.getOrElseUpdate(e.stageId, scala.collection.mutable.ArrayBuffer()) += m.executorRunTime / 1e3
          if (m.executorRunTime / 1e3 > 15.0)
            println(f"SLOWTASK stage=${e.stageId} idx=${e.taskInfo.index} sec=${m.executorRunTime / 1e3}%.1f " +
              f"gc=${m.jvmGCTime / 1e3}%.1f cpu=${m.executorCpuTime / 1e9}%.1f " +
              f"inRec=${m.inputMetrics.recordsRead} shufRec=${m.shuffleReadMetrics.recordsRead}")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        val scopes = e.stageInfo.rddInfos.flatMap(r => r.scope.map(_.name))
          .distinct.mkString(" | ")
        names(e.stageInfo.stageId) = scopes
      }
    })
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
    Thread.sleep(1000)
    tasks.toSeq.sortBy(_._1).foreach { case (sid, ts) =>
      val d = ts.sorted
      val med = d(d.size / 2)
      val ratio = if (med > 0) d.last / med else 0.0
      if (d.size >= 4 && d.last > 2.0)
        println(f"stage=$sid n=${d.size}%-4d med=$med%8.2f max=${d.last}%8.2f ratio=$ratio%6.2f  ${names.getOrElse(sid, "?").take(220)}")
    }
    spark.stop()
  }
}
