package graft.sortbench

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorting + top-K surface (reference algorithms/sorting.py:33-857,
  * main.py:105-291 — SURVEY.md §2.6).
  *
  * The reference ships 12 hand-written sort algorithms behind one
  * registry; all 12 have identical semantics (sort by key ascending), so
  * here every named "algorithm" plans to the same `orderBy` — Spark's
  * sort-based shuffle + codegen'd UnsafeExternalSorter replaces the whole
  * family, and `orderBy().limit()` plans as TakeOrderedAndProject (a
  * distributed partial top-K, the same idea as the reference's
  * selection-of-max top-15). The registry is kept so the reference's
  * benchmark harness (measure → verify → report) maps 1:1.
  */
object Sorting {

  /** K1: the reference's algorithm registry (sorting.py ALGORITHMS). */
  val Algorithms: Seq[String] = Seq(
    "timsort", "comb", "selection", "tree", "pigeonhole", "bucket",
    "quicksort", "heapsort", "bitonic", "gnome", "binary_insertion", "radix")

  /** K1/K3: named-strategy sort — every algorithm is the same plan. */
  def runSort(df: DataFrame, algorithm: String, keys: Column*): DataFrame = {
    require(Algorithms.contains(algorithm), s"unknown algorithm: $algorithm")
    df.orderBy(keys: _*)
  }

  /** K2: the reference's multi-criteria integer key —
    * dateCompact·100000 + closeCents, dateCompact = (y−2000)·366 +
    * (m−1)·31 + d (main.py:139-169). Kept bit-exact for benchmark parity.
    * NOTE the reference's encoding is NOT order-preserving across year
    * boundaries ((m−1)·31+d reaches 372 > 366, so Dec 29-31 encode above
    * Jan 1-6 of the next year); the engine's real sorts order by the
    * (date, close) columns directly — use this key only for parity. */
  def multiKeyDateClose(date: Column, close: Column): Column =
    (((year(date) - 2000) * 366 + (month(date) - 1) * 31 + dayofmonth(date))
      .cast("long") * 100000L +
      round(close * 100).cast("long"))

  /** K4: top-N by measure — TakeOrderedAndProject, then re-sorted
    * ascending like the reference's final insertion sort (main.py:216-267). */
  def topNBy(df: DataFrame, n: Int, measure: Column, tiebreak: Column*): DataFrame =
    df.orderBy((measure.desc +: tiebreak): _*).limit(n)
      .orderBy((measure.asc +: tiebreak): _*)

  /** B1: wall-clock one full materialization of a plan. */
  def measure(df: DataFrame): Double = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    (System.nanoTime() - t0) / 1e9
  }

  /** B2+B3: run every named algorithm over the same input/key, verify all
    * outputs are identical (exceptAll both ways — the reference's N-version
    * oracle, timing.py:104-134), and return a timing report frame. */
  def benchmark(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val reference = runSort(df, Algorithms.head, keys: _*)
    val rows = Algorithms.map { alg =>
      val sorted = runSort(df, alg, keys: _*)
      val t = measure(sorted)
      val consistent = sorted.exceptAll(reference).isEmpty &&
        reference.exceptAll(sorted).isEmpty
      (alg, t, t * 1000.0, consistent)
    }
    rows.toDF("algorithm", "time_seconds", "time_ms", "verified")
  }
}
