package graft.analytics

/** Banded DTW kernels (reference algorithms/similarity.py:200-352 and
  * :536-608 — SURVEY.md §2.9 X1/X2).
  *
  * Plain Scala kernels by design: per-pair series are collected to a few
  * thousand points (SURVEY.md §4 — no custom Catalyst surface needed), and
  * the pair-level parallelism is Spark's (one task per pair via
  * `Dataset.map` over a pair join). At 100 TB the collected-arrays
  * assumption is revisited per series length, not data volume — series
  * length is bounded by the calendar, not the row count.
  */
object Dtw {

  /** X1: banded DTW distance with 2-row DP.
    * window: None → band max(n,m)/4 floored at 10; Some(0) → unbanded;
    * band always widened to ≥ |n−m| so the corner is reachable. Empty
    * input → 0.0 (similarity.py:269-271). */
  def distance(a: Array[Double], b: Array[Double], window: Option[Int] = None): Double = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    var w = window match {
      case None => math.max(10, math.max(n, m) / 4)
      case Some(0) => math.max(n, m)
      case Some(x) => x
    }
    w = math.max(w, math.abs(n - m))
    val Inf = Double.PositiveInfinity
    var prev = Array.fill(m)(Inf)
    var curr = Array.fill(m)(Inf)
    var j = 0
    while (j < m && j <= w) {
      val cost = math.abs(a(0) - b(j))
      prev(j) = if (j == 0) cost else cost + prev(j - 1)
      j += 1
    }
    var i = 1
    while (i < n) {
      java.util.Arrays.fill(curr, Inf)
      val lo = math.max(0, i - w)
      val hi = math.min(m - 1, i + w)
      j = lo
      while (j <= hi) {
        val cost = math.abs(a(i) - b(j))
        var best = prev(j)
        if (j > 0) {
          if (curr(j - 1) < best) best = curr(j - 1)
          if (prev(j - 1) < best) best = prev(j - 1)
        }
        curr(j) = cost + best
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(m - 1)
  }

  /** X2: full-matrix DTW + greedy backtrack (ties: diagonal > up > left,
    * strict '<' keeps the first candidate — similarity.py:566-583).
    * Only used for visualization on ≤80-point samples. */
  def distanceWithPath(a: Array[Double], b: Array[Double]): (Double, Seq[(Int, Int)]) = {
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return (0.0, Seq.empty)
    val d = Array.ofDim[Double](n, m)
    for (i <- 0 until n; j <- 0 until m) {
      val cost = math.abs(a(i) - b(j))
      d(i)(j) =
        if (i == 0 && j == 0) cost
        else if (i == 0) cost + d(0)(j - 1)
        else if (j == 0) cost + d(i - 1)(0)
        else cost + math.min(d(i - 1)(j - 1), math.min(d(i - 1)(j), d(i)(j - 1)))
    }
    var i = n - 1
    var j = m - 1
    val path = scala.collection.mutable.ArrayBuffer((i, j))
    while (i > 0 || j > 0) {
      if (i == 0) j -= 1
      else if (j == 0) i -= 1
      else {
        val cands = Seq((d(i - 1)(j - 1), i - 1, j - 1), (d(i - 1)(j), i - 1, j),
          (d(i)(j - 1), i, j - 1))
        val best = cands.reduceLeft((x, y) => if (y._1 < x._1) y else x)
        i = best._2; j = best._3
      }
      path += ((i, j))
    }
    (d(n - 1)(m - 1), path.reverse.toSeq)
  }
}
