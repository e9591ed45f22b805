package graft

/** Structural lint over the generated DuckDB oracle SQL — turns the
  * round-8 percentile-parity rule (operators/OracleSql scaladoc) from a
  * review convention into a failing test.
  *
  * Rule: Spark's exact `percentile` short-circuits to the value itself
  * when the position lands between tied neighbors; DuckDB's
  * `quantile_cont` evaluates (1−f)·a + f·b, which re-rounds a tie's
  * last ulp. Any NON-median percentile in oracle SQL must therefore be
  * expressed through `OracleSql.pctChain` (Spark's chain, bit-exact).
  * Medians are exempt by proof: at p = 0.5 both engines reduce to
  * 0.5a + 0.5b with exact coefficients, and a tie gives exactly the
  * value. */
class OracleLintSpec extends SparkSpec {

  /** All `fn(...)` call argument strings in `sql`, parens balanced. */
  private def calls(sql: String, fn: String): Seq[String] = {
    val lower = sql.toLowerCase
    val out = Seq.newBuilder[String]
    var from = lower.indexOf(fn + "(")
    while (from >= 0) {
      var i = from + fn.length + 1
      var depth = 1
      val arg = new StringBuilder
      while (depth > 0 && i < sql.length) {
        val c = sql.charAt(i)
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        if (depth > 0) arg.append(c)
        i += 1
      }
      out += arg.toString
      from = lower.indexOf(fn + "(", i)
    }
    out.result()
  }

  test("non-median quantile_cont is banned from oracle SQL (use OracleSql.pctChain)") {
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      arg <- calls(sql, "quantile_cont")
      if !arg.replaceAll("\\s", "").endsWith(",0.5")
    } yield s"$name: quantile_cont($arg)"
    assert(bad.isEmpty,
      s"non-median percentiles must route through OracleSql.pctChain " +
        s"(tie short-circuit vs re-rounding divergence):\n${bad.mkString("\n")}")
  }

  test("percentile_cont/percentile_disc/quantile_disc never appear in oracle SQL") {
    // the windowed/discrete spellings share (or worsen) the same
    // divergence and have no pctChain-audited call sites at all
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      fn <- Seq("percentile_cont", "percentile_disc", "quantile_disc")
      if sql.toLowerCase.contains(fn + "(")
    } yield s"$name: $fn"
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
