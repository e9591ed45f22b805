package graft

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualNullSafe, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Catalog-wide pin of the no-single-task-window invariant: no catalog
  * query may plan a Window with EMPTY partitioning whose input is
  * unbounded table data — on a cluster that window serializes the whole
  * frame through one task. Global windows over a prior aggregation are
  * fine (the frame is bounded by group cardinality — the t38-strata
  * class), as are limits and literal/local inputs.
  *
  * Materialized intermediates (LogicalRDD from Graft.materialize /
  * GlobalRank sweeps) are treated as bounded here because their
  * producing plan is audited where it is built — GlobalRank exists
  * precisely to REPLACE unpartitioned windows, so re-flagging its
  * output would ban the cure along with the disease. */
class WindowInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** A conjunct pinning a column to literal key value(s) — the frame
    * below is one key's rows (a single series), the identical cost
    * class as ONE partition of a keyed window. The pair-analytics
    * queries (w10/z1/z2: two key-filtered series joined on position,
    * then a global rolling window over the aligned pair) are this
    * shape — inherently sequential series math, not a scale bug.
    * Range predicates deliberately do NOT count: a date band over a
    * fact table bounds nothing. */
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
  private def unbounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => false
    case _: GlobalLimit | _: LocalLimit => false
    case _: LocalRelation | _: OneRowRelation => false
    case _: LogicalRDD => false // materialized; audited at its origin
    case f: Filter if keyEqualityBound(f.condition) => false // one key's series
    case _: LogicalRelation => true // a full table scan
    case leaf if leaf.children.isEmpty => true // unknown leaf: assume the worst
    case other => other.children.exists(unbounded)
  }

  test("no catalog query windows over an unbounded unpartitioned frame") {
    val offenders = for {
      (name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)
      plan = q(spark, sf).queryExecution.optimizedPlan
      w <- plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
      if unbounded(w.child)
    } yield s"$name: global window over unbounded input\n${w.child.treeString.take(400)}"
    assert(offenders.isEmpty,
      s"single-task windows found (partition them or route through " +
        s"GlobalRank):\n${offenders.mkString("\n")}")
  }
}
