package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: dump `.explain("formatted")` for declared queries to files.
  *
  *   runMain graft.PlanDump <outDir> <suffix> [names-csv|all] [sfDir]
  *
  * Writes `<outDir>/<query>_<suffix>.txt` per query — the round's plan
  * evidence (`plans/rNN/<query>_before.txt` / `..._after.txt`). Plans are
  * the ANALYZED-at-submit physical plans (AQE `isFinalPlan=false`), which
  * is what `explain` can show without executing; Exchange counts, join
  * strategies, PushedFilters and ReadSchema are all visible at this stage.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args.length < 3 || args(2) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $name ok (${plan.count(_ == '\n')} lines)")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally Graft.releaseMaterialized(spark)
    }
    spark.stop()
  }
}
