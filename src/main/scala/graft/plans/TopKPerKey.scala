package graft.plans

import org.apache.spark.{GraftCoreBridge, TaskContext}
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager}
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
  * cannot spill. The partial side therefore flushes under pressure,
  * and the pressure signal is Spark's own: the estimated retained
  * bytes are ACCOUNTED against the task's unified memory through a
  * registered [[org.apache.spark.memory.MemoryConsumer]], so the map
  * competes fairly with every built-in spillable exec in the task,
  * and the first DENIED grant (pool exhausted, or the
  * `spark.graft.topk.testMaxGrantBytes` test cap) triggers the flush.
  * A row-count backstop (`spark.graft.topk.partialFlushRows`, default
  * 4M) still bounds the segment when memory is plentiful. A flushed
  * stream is still a valid partial — each key's true top-k is
  * contained in the union of its per-segment top-k survivors, and the
  * final pass re-reduces the union — so the bound holds
  * unconditionally with zero extra shuffle. The final pass must NOT
  * flush (its heaps ARE the answer and a key may span segments); its
  * retention is ≤ k rows per key in its hash partition, i.e. the
  * operator's own output, spread across `shuffle.partitions` reducers.
  * The `flushes` / `memFlushes` SQL metrics count pressure events
  * (all / memory-denial-caused) so the escape is observable in the UI
  * and in tests.
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
      "partial heap flushes under memory pressure"),
    "memFlushes" -> SQLMetrics.createMetric(sparkContext,
      "flushes caused by a denied unified-memory grant"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyEx = keyExprs
    val ordEx = order
    val attrs = child.output
    // Row-count backstop, partial side only; the final side's heaps
    // are the answer and must survive to end-of-input.
    val rowBudget: Long =
      if (partial)
        conf.getConfString("spark.graft.topk.partialFlushRows", (1 << 22).toString).toLong
      else Long.MaxValue
    // Test seam: cap the total bytes the consumer may be GRANTED so a
    // spec can exercise the denial→flush path without shrinking the
    // JVM's memory pool (which is per-SparkContext, not per-test).
    val testGrantCap: Long =
      conf.getConfString("spark.graft.topk.testMaxGrantBytes", "-1").toLong
    val flushMetric = longMetric("flushes")
    val memFlushMetric = longMetric("memFlushes")
    val registerMemory = partial
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyEx, attrs)
      val rowProj = UnsafeProjection.create(attrs, attrs)
      val ord = RowOrdering.create(ordEx, attrs)
      val tc = TaskContext.get()
      val consumer =
        if (registerMemory && tc != null)
          Some(new TopKMemoryConsumer(
            GraftCoreBridge.taskMemoryManager(tc), testGrantCap))
        else None
      consumer.foreach(c => tc.addTaskCompletionListener[Unit](_ => c.releaseAll()))
      // max-heap on the sort order: the WORST retained row sits at the
      // head, so each insertion is one compare + O(log k)
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = -ord.compare(a, b)
      }
      var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var retained = 0L
      // Estimated retained bytes: row/key UnsafeRow payloads plus a
      // fixed per-entry JVM overhead (HashMap node / PQ slot / object
      // headers). The estimate is what gets accounted to the memory
      // manager — the structures are on-heap, so no pages are ever
      // allocated, only reserved.
      val entryOverhead = 64L
      var estBytes = 0L
      var memPressure = false
      def consume(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kLocal + 1, cmp)
          val keyCopy = key.copy()
          heaps.put(keyCopy, heap)
          estBytes += keyCopy.getSizeInBytes + entryOverhead
        }
        if (heap.size() < kLocal) {
          val r = rowProj(row).copy()
          heap.add(r)
          retained += 1
          estBytes += r.getSizeInBytes + entryOverhead
        } else if (ord.compare(rowProj(row), heap.peek()) < 0) {
          val evicted = heap.poll()
          val r = rowProj(row).copy()
          heap.add(r)
          estBytes += r.getSizeInBytes - evicted.getSizeInBytes
        }
        memPressure = consumer.exists(c => !c.ensure(estBytes))
      }
      import scala.jdk.CollectionConverters._
      // Hand the CURRENT map to the output iterator and start a fresh
      // one: the drained heaps stay alive only until the shuffle writer
      // consumes them, while new input accumulates into the new map.
      // The reservation is returned at drain start — the survivors are
      // streamed straight into the shuffle writer, whose own buffers
      // are separately accounted.
      def drain(): Iterator[UnsafeRow] = {
        val old = heaps
        heaps = new java.util.HashMap()
        retained = 0L
        estBytes = 0L
        memPressure = false
        consumer.foreach(_.releaseAll())
        old.values().asScala.iterator.flatMap(_.iterator().asScala)
      }
      // Consume input until the memory manager denies the reservation
      // or the retained-row backstop is hit (flush), or input ends
      // (final drain); emit each drained batch lazily.
      def nextBatch(): Iterator[UnsafeRow] = {
        while (it.hasNext) {
          consume(it.next())
          // A denial (or budget hit) on the FINAL input row coincides
          // with the end-of-input drain — don't count it as a pressure
          // event, or the metric overstates flushes by one.
          if (memPressure) {
            if (it.hasNext) { flushMetric += 1; memFlushMetric += 1 }
            return drain()
          }
          if (retained >= rowBudget) {
            if (it.hasNext) flushMetric += 1
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

/** Unified-memory bookkeeping for the partial heap map. The map lives
  * on the JVM heap, so no pages are allocated — the consumer RESERVES
  * the estimated retained bytes against the task's execution-memory
  * pool, which (a) lets Spark's spillable execs see this task's real
  * footprint and (b) turns pool exhaustion into a denied grant, the
  * exec's flush signal. `spill` returns 0: the heaps cannot shed rows
  * on another consumer's schedule (a segment's survivors must be
  * emitted together for the partial-correctness argument to hold); the
  * flush instead happens on the task thread at the next insert, which
  * frees the whole reservation. `grantCap ≥ 0` is a test seam bounding
  * the total grant so specs can force the denial path deterministically. */
private[plans] final class TopKMemoryConsumer(
    tmm: TaskMemoryManager, grantCap: Long)
    extends MemoryConsumer(tmm, MemoryMode.ON_HEAP) {
  private var granted = 0L

  override def spill(size: Long, trigger: MemoryConsumer): Long = 0L

  /** Bring the total reservation up to `needed` bytes (acquiring at
    * least 1 MiB per call to amortize manager locking); false = the
    * manager (or the test cap) denied part of the request. */
  def ensure(needed: Long): Boolean = {
    if (needed <= granted) true
    else {
      val want = math.max(needed - granted, TopKMemoryConsumer.MinChunk)
      val capped = if (grantCap >= 0) math.min(want, grantCap - granted) else want
      if (capped > 0) granted += acquireMemory(capped)
      granted >= needed
    }
  }

  def releaseAll(): Unit = if (granted > 0) { freeMemory(granted); granted = 0L }
}

private[plans] object TopKMemoryConsumer {
  val MinChunk: Long = 1L << 20
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
