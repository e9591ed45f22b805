package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The no-single-task-window invariant, as executable plan analysis: no
  * plan may evaluate a Window with EMPTY partitioning whose input is
  * unbounded table data — on a cluster that window serializes the whole
  * frame through one task (WindowExec's "No Partition Defined" path).
  * Global windows over a prior aggregation are fine (the frame is
  * bounded by group cardinality), as are limits, literal/local inputs,
  * and frames pinned to one key's rows by an equality filter (a single
  * series — the same cost class as ONE partition of a keyed window).
  *
  * Two enforcement points share this logic:
  *  - [[graft.Graft.materialize]] asserts it on every plan it is about
  *    to checkpoint, so a materialized intermediate can never smuggle an
  *    unaudited single-task window into downstream plans — which is what
  *    makes treating `LogicalRDD` as bounded sound BY INDUCTION rather
  *    than by convention: every LogicalRDD a catalog query can contain
  *    was itself audited here when it was produced;
  *  - WindowInvariantSpec sweeps every catalog query's optimized plan,
  *    catching the non-materialized occurrences.
  */
object WindowAudit {

  /** Is `name` plausibly a series/entity KEY, i.e. a column whose
    * literal-equality filter pins the frame to one key's rows? This is
    * load-bearing enforcement (materialize asserts through it), so the
    * match is deliberately narrow: id/key-suffixed names plus the
    * engine's series identifiers. A literal equality on a NON-key
    * column (`flag = true`, `event_type = 'purchase'`) selects a
    * category, not a series — it bounds nothing at scale and must NOT
    * mark the frame bounded (the r10 false-negative class). Residual
    * false negatives are name-level only (a key column named e.g.
    * `series` would need adding here — the assert then fails loudly,
    * the safe direction). The id match is word-boundary (`id` or
    * `*_id`), NOT a bare `endsWith("id")`: names like `paid`, `valid`,
    * or `bid` are category columns, and marking a category-filtered
    * fact frame key-bounded is exactly the unsafe direction the r10
    * fix closed for `status = 'F'` (r11 ADVICE #4). `endsWith("key")`
    * stays suffix-level for the TPC-H `*key` family (o_orderkey,
    * l_partkey, ...) — no English category-column name ends in "key". */
  private def keyLikeName(name: String): Boolean = {
    val n = name.toLowerCase
    n == "id" || n.endsWith("_id") || n.endsWith("key") ||
      Set("symbol", "sym", "ticker", "asset").contains(n)
  }

  /** A conjunct pinning a KEY column to literal value(s) — the frame
    * below is one key's rows. Range predicates deliberately do NOT
    * count: a date band over a fact table bounds nothing. */
  private def keyEqualityBound(e: Expression): Boolean = e match {
    case And(l, r) => keyEqualityBound(l) || keyEqualityBound(r)
    case EqualTo(a: Attribute, _: Literal) => keyLikeName(a.name)
    case EqualTo(_: Literal, a: Attribute) => keyLikeName(a.name)
    case EqualNullSafe(a: Attribute, _: Literal) => keyLikeName(a.name)
    case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) => keyLikeName(a.name)
    case _ => false
  }

  /** True when unbounded source rows can reach this node without
    * passing through an aggregation, limit, or literal-key filter. */
  def unbounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => false
    case _: GlobalLimit | _: LocalLimit => false
    case _: LocalRelation | _: OneRowRelation => false
    case _: LogicalRDD => false // materialized; audited below when produced
    case f: Filter if keyEqualityBound(f.condition) => false // one key's series
    case _: LogicalRelation => true // a full table scan
    case leaf if leaf.children.isEmpty => true // unknown leaf: assume the worst
    case other => other.children.exists(unbounded)
  }

  /** The offending Window nodes of `plan`, empty when the invariant holds. */
  def singleTaskWindows(plan: LogicalPlan): Seq[Window] =
    plan.collect { case w: Window if w.partitionSpec.isEmpty && unbounded(w.child) => w }

  /** Fail loudly if `df`'s optimized plan windows over an unbounded
    * unpartitioned frame. Called from [[graft.Graft.materialize]];
    * costs one tree walk — the optimized plan is computed by the lazy
    * checkpoint's own planning anyway. */
  def assertNoSingleTaskWindow(df: DataFrame, context: String): Unit = {
    val offenders = singleTaskWindows(df.queryExecution.optimizedPlan)
    if (offenders.nonEmpty) throw new IllegalStateException(
      s"$context: global window over unbounded input — this serializes the " +
        s"whole frame through one task at scale; partition it or route " +
        s"through GlobalRank:\n${offenders.map(_.child.treeString.take(400)).mkString("\n")}")
  }
}
