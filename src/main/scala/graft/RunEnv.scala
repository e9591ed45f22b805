package graft

import scala.jdk.CollectionConverters._

/** Run-environment fingerprint embedded in every bench/correctness
  * artifact this repo emits (r10 verdict item 1): git SHA (+ dirty
  * flag), thread count, rep count, JVM max heap + GC, java version,
  * and loadavg. Before this, cross-round comparisons had to
  * reverse-engineer the run config by fingerprinting loadavg_after
  * against prose in the SCALE notes — the artifact now says "32
  * threads" itself. BenchEnvSpec pins the fields and that the sha is
  * HEAD at write time.
  */
object RunEnv {

  private def sh(cmd: String*): String =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      if (p.waitFor() == 0) out else ""
    } catch { case _: Throwable => "" }

  def gitSha: String = sh("git", "rev-parse", "HEAD")

  /** Tracked-file modifications only: an artifact produced with edits
    * not in `gitSha` must say so (untracked build/output dirs are
    * normal and don't taint the fingerprint). */
  def gitDirty: Boolean =
    sh("git", "status", "--porcelain", "--untracked-files=no").nonEmpty

  def loadavg: String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split(" ").take(3).mkString(",")
    catch { case _: Throwable => "" }

  def heapMaxMb: Long = Runtime.getRuntime.maxMemory() / (1024L * 1024L)

  def gcNames: Seq[String] =
    try java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getName).toSeq
    catch { case _: Throwable => Seq.empty }

  private def jq(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** One JSON object with the run config an artifact needs to be
    * self-describing. `cpus` is the local[] thread count the caller
    * resolved (env default included — the artifact records what RAN,
    * not what was set); `reps` likewise. */
  def json(cpus: String, reps: Int): String = {
    val sha = gitSha
    s"""{"sha":${jq(if (sha.nonEmpty) sha else "unknown")},""" +
      s""""git_dirty":$gitDirty,"cpus":${jq(cpus)},"reps":$reps,""" +
      s""""heap_max_mb":$heapMaxMb,""" +
      s""""gc":${gcNames.map(jq).mkString("[", ",", "]")},""" +
      s""""java":${jq(sys.props.getOrElse("java.version", ""))},""" +
      s""""loadavg":${jq(loadavg)}}"""
  }
}
