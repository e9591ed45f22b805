package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator Catalyst extension: top-k rows per key via bounded
  * per-partition heaps — the (c) rung of the custom-operator ladder
  * (logical node + SparkStrategy + physical exec, registered through
  * SparkSessionExtensions by [[graft.functions.GraftExtensions]]).
  *
  * Why not the `row_number().over(...) <= k` idiom: the window plan
  * SORTS every key's full row set after the shuffle (O(n log n) per
  * key, full materialization). This operator keeps at most k rows per
  * key in a heap on BOTH sides of the exchange — the map side sends
  * k·keys rows per partition instead of everything (the per-key
  * generalization of what TakeOrderedAndProject does globally), and
  * the reduce side never sorts more than k rows per key. At 100 TB
  * with bounded k the shuffle shrinks by orders of magnitude; the
  * window idiom cannot do partial reduction at all.
  */
case class TopKPerKeyNode(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical form: `partial = true` runs before the exchange (per input
  * partition, any distribution), `partial = false` after it (keys
  * co-located via requiredChildDistribution, so the surviving heap per
  * key IS the answer). Both sides run the identical bounded-heap pass.
  *
  * Memory posture: the heap map holds ≤ min(input rows, k·distinct
  * keys) copied rows per partition, which on a near-unique key IS the
  * partition — unlike the sort/window idiom, a hash map of heaps
  * cannot spill. The partial side therefore flushes under pressure:
  * when retained rows reach `spark.graft.topk.partialFlushRows`
  * (default 4M), every current heap drains downstream and the map
  * resets. A flushed stream is still a valid partial — each key's
  * true top-k is contained in the union of its per-segment top-k
  * survivors, and the final pass re-reduces the union — so the bound
  * holds unconditionally with zero extra shuffle. The final pass must
  * NOT flush (its heaps ARE the answer and a key may span segments);
  * its retention is ≤ k rows per key in its hash partition, i.e. the
  * operator's own output, spread across `shuffle.partitions` reducers.
  * The `flushes` SQL metric counts pressure events so the escape is
  * observable in the UI and in tests.
  */
case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keyExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "flushes" -> SQLMetrics.createMetric(sparkContext,
      "partial heap flushes under memory pressure"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyEx = keyExprs
    val ordEx = order
    val attrs = child.output
    // The budget only applies to the partial side; the final side's
    // heaps are the answer and must survive to end-of-input.
    val budget: Long =
      if (partial)
        conf.getConfString("spark.graft.topk.partialFlushRows", (1 << 22).toString).toLong
      else Long.MaxValue
    val flushMetric = longMetric("flushes")
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyEx, attrs)
      val rowProj = UnsafeProjection.create(attrs, attrs)
      val ord = RowOrdering.create(ordEx, attrs)
      // max-heap on the sort order: the WORST retained row sits at the
      // head, so each insertion is one compare + O(log k)
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var retained = 0L
      def consume(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) {
          heap.add(rowProj(row).copy())
          retained += 1
        } else if (ord.compare(rowProj(row), heap.peek()) < 0) {
          heap.poll()
          heap.add(rowProj(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      // Hand the CURRENT map to the output iterator and start a fresh
      // one: the drained heaps stay alive only until the shuffle writer
      // consumes them, while new input accumulates into the new map.
      def drain(): Iterator[UnsafeRow] = {
        val old = heaps
        heaps = new java.util.HashMap()
        retained = 0L
        old.values().asScala.iterator.flatMap(_.iterator().asScala)
      }
      // Consume input until the retained-row budget is hit (flush) or
      // input ends (final drain); emit each drained batch lazily.
      def nextBatch(): Iterator[UnsafeRow] = {
        while (it.hasNext) {
          consume(it.next())
          if (retained >= budget) {
            flushMetric += 1
            return drain()
          }
        }
        drain()
      }
      new Iterator[InternalRow] {
        private var out: Iterator[UnsafeRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!out.hasNext && (it.hasNext || !heaps.isEmpty)) out = nextBatch()
          out.hasNext
        }
        override def next(): InternalRow = out.next()
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Public API: top-k rows per key, `order` as (column, descending)
    * pairs. Columns resolve by name against the input's analyzed
    * output, so the custom node is built fully resolved — no
    * dependence on analyzer traversal into third-party nodes. */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"top-k per key needs k > 0, got $k")
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(a =>
        df.sparkSession.sessionState.analyzer.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val so = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftSqlBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keys.map(attr), so, k, analyzed))
  }
}
