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

  /** A conjunct pinning a column to literal key value(s) — the frame
    * below is one key's rows. Range predicates deliberately do NOT
    * count: a date band over a fact table bounds nothing. */
  private def keyEqualityBound(e: Expression): Boolean = e match {
    case And(l, r) => keyEqualityBound(l) || keyEqualityBound(r)
    case EqualTo(_: Attribute, _: Literal) => true
    case EqualTo(_: Literal, _: Attribute) => true
    case EqualNullSafe(_: Attribute, _: Literal) => true
    case In(_: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) => true
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
