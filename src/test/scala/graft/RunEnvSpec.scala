package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the run-env fingerprint every bench/correctness artifact embeds
  * ([[RunEnv]], r10 verdict item 1): all fields present, and the sha is
  * genuinely HEAD at write time — not a stale or hardcoded value. The
  * fields exist so cross-round comparisons stop reverse-engineering the
  * run config from loadavg; a fingerprint that lies would be worse than
  * none. */
class RunEnvSpec extends AnyFunSuite {

  test("env json carries sha/cpus/reps/heap/gc/java/loadavg, sha == HEAD") {
    val j = RunEnv.json(cpus = "32", reps = 3)
    // sha: 40-hex and identical to an independent rev-parse
    val sha = "\"sha\":\"([0-9a-f]{40})\"".r.findFirstMatchIn(j)
      .map(_.group(1)).getOrElse(fail(s"no 40-hex sha in $j"))
    val head = new String(new ProcessBuilder("git", "rev-parse", "HEAD")
      .start().getInputStream.readAllBytes()).trim
    assert(sha == head, s"artifact sha $sha != HEAD $head")
    assert(j.contains("\"git_dirty\":"), j)
    assert(j.contains("\"cpus\":\"32\""), j)
    assert(j.contains("\"reps\":3"), j)
    val heap = "\"heap_max_mb\":(\\d+)".r.findFirstMatchIn(j)
      .map(_.group(1).toLong).getOrElse(fail(s"no heap_max_mb in $j"))
    assert(heap > 0, s"heap_max_mb must be positive, got $heap")
    assert("\"gc\":\\[\"[^\"]+\"".r.findFirstIn(j).nonEmpty,
      s"gc list empty or missing in $j")
    assert("\"java\":\"[^\"]+\"".r.findFirstIn(j).nonEmpty, j)
    // loadavg: three comma-separated floats on this platform
    assert("\"loadavg\":\"[0-9.]+,[0-9.]+,[0-9.]+\"".r.findFirstIn(j).nonEmpty, j)
    // the fragment is itself valid JSON (it gets spliced into artifacts)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(j)
    for (f <- Seq("sha", "git_dirty", "cpus", "reps", "heap_max_mb", "gc", "java", "loadavg"))
      assert(node.has(f), s"field $f missing after JSON parse")
  }
}
