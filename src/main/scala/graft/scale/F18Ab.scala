package graft.scale

import graft.{Graft, RunEnv}
import graft.operators.CohortQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** A/B for f18_assoc_rules' basket-frame materialization (r10 verdict
  * item 4 — the t21 playbook applied to the one remaining
  * bounded-but-wide sf10 wall band). The ~40 M-row distinct
  * (order, brand) frame feeds four consumers; the arms vary only HOW it
  * is held between them (see the arm list at the `arms` val).
  *
  * Each arm runs `reps` timed noop-sink executions after one untimed
  * warmup, caches cleared between reps so arms never see another rep's
  * blocks. One JSON line (medians + all walls + run env) for the
  * artifact. Usage:
  *   runMain graft.scale.F18Ab <sfDir> [reps=5] [outFile]
  */
object F18Ab {

  private def jq(s: String): String = "\"" + s + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "target/scale/sf10"
    val reps = if (args.length > 1) args(1).toInt else 5
    val outFile = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // heapchk = deserialized heap checkpoint blocks (the pre-r11 default)
    // diskchk = row-blob RDD checkpoint blocks on disk (REJECTED: the
    //           serialization format, not the medium, is the cost —
    //           measured worse than heap)
    // disk    = columnar compressed persist(DISK_ONLY) — what
    //           Graft.materializeDisk does; the production choice
    val arms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "heapchk" -> Graft.materialize,
      "diskchk" -> ((df: DataFrame) =>
        df.localCheckpoint(false, StorageLevel.DISK_ONLY)),
      "disk" -> Graft.materializeDisk,
      "recompute" -> identity[DataFrame] _)

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }

    val results = arms.map { case (name, mat) =>
      val q = CohortQueries.f18AssocRulesWith(mat)
      def once(): Double = {
        val t0 = System.nanoTime()
        q(spark, sfDir).write.mode("overwrite").format("noop").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // Drop this rep's persisted AND checkpointed blocks before the
        // next rep times anything: clearCache alone only emptied the
        // CacheManager, leaving the heapchk/diskchk arms' checkpoint RDD
        // blocks to ContextCleaner GC — later reps of those arms ran
        // with prior reps' ~40M-row blocks still pinned, biasing their
        // walls upward (r11 ADVICE #2). blocking=true so the blocks are
        // actually gone, not merely scheduled to go.
        Graft.releaseMaterialized(spark, blocking = true)
        wall
      }
      once() // untimed warmup per arm (JIT + page cache for its shape)
      val walls = (1 to reps).map(_ => once())
      System.err.println(f"[f18ab] $name%-9s median ${median(walls)}%.2f s  ${walls.map(w => f"$w%.2f").mkString(" ")}")
      (name, walls)
    }

    val json = "{" +
      s""""metric":"f18_assoc_rules_ab","sf_dir":${jq(sfDir)},"reps":$reps,""" +
      results.map { case (n, ws) =>
        s"${jq(n)}:{"+ s""""median":${median(ws)},"walls":[${ws.mkString(",")}]}"""
      }.mkString(",") +
      s""","env":${RunEnv.json(cpus, reps)}}"""
    println(json)
    outFile.foreach { f =>
      val p = java.nio.file.Paths.get(f)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
