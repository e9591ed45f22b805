package graft

import graft.analytics.{Dtw, Similarity}
import org.apache.spark.sql.functions._

/** Reference fixture: algorithms/similarity.py:613-652 (FIXTURES.md §2.1) —
  * raw-value series a (identity), c (inverted), d (noisy). */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0)
  private val c = Seq(5.0, 4.0, 3.0, 2.0, 1.0)
  private val d = Seq(1.1, 2.2, 2.8, 4.1, 5.2)

  private def pairDf(x: Seq[Double], y: Seq[Double]) =
    x.zip(y).toDF("a", "b")

  test("identity pair: euclid 0, pearson 1, cosine 1") {
    val m = Similarity.metrics(pairDf(a, a))
      .select("euclidean", "pearson", "cosine", "n_points").head()
    assert(approx(m.getDouble(0), 0.0))
    assert(approx(m.getDouble(1), 1.0, 1e-10))
    assert(approx(m.getDouble(2), 1.0, 1e-10))
    assert(m.getLong(3) == 5L)
  }

  test("inverted pair: pearson -1, cosine matches reference value") {
    val m = Similarity.metrics(pairDf(a, c)).select("pearson", "cosine").head()
    assert(approx(m.getDouble(0), -1.0, 1e-10))
    assert(approx(m.getDouble(1), 0.6363636363636364, 1e-10))
  }

  test("noisy pair matches reference euclid/pearson") {
    val m = Similarity.metrics(pairDf(a, d)).select("euclidean", "pearson").head()
    assert(approx(m.getDouble(0), 0.37416573867739433, 1e-10))
    assert(approx(m.getDouble(1), 0.9947963172651939, 1e-10))
  }

  test("zero-variance series yields pearson 0.0, zero-norm cosine 0.0") {
    val flat = Seq.fill(5)(3.0)
    val m = Similarity.metrics(pairDf(flat, a)).select("pearson").head()
    assert(m.getDouble(0) == 0.0)
    val zeros = Seq.fill(5)(0.0)
    val mz = Similarity.metrics(pairDf(zeros, a)).select("cosine").head()
    assert(mz.getDouble(0) == 0.0)
  }

  test("positional pair alignment joins two series of a long table") {
    val long = (a.zipWithIndex.map { case (v, i) => (i, "A", v) } ++
      c.zipWithIndex.map { case (v, i) => (i, "C", v) }).toDF("i", "symbol", "v")
    val aligned = Similarity.alignPair(long, Seq("symbol"), Seq(col("i")), col("v"), "A", "C")
    assert(aligned.count() == 5)
    val m = Similarity.metrics(aligned).select("pearson").head()
    assert(approx(m.getDouble(0), -1.0, 1e-10))
  }

  test("heatmap is symmetric with unit diagonal") {
    val long = (a.zipWithIndex.map { case (v, i) => (i, "A", v) } ++
      c.zipWithIndex.map { case (v, i) => (i, "C", v) } ++
      d.zipWithIndex.map { case (v, i) => (i, "D", v) }).toDF("i", "symbol", "v")
    val posed = Similarity.withPos(long, Seq("symbol"), Seq(col("i")))
      .select(col("symbol"), col("pos"), col("v"))
    val hm = Similarity.heatmap(posed, "symbol")
      .as[(String, String, Double)].collect()
      .map { case (x, y, v) => (x, y) -> v }.toMap
    assert(hm.size == 9)
    assert(hm(("A", "A")) == 1.0)
    assert(approx(hm(("A", "C")), hm(("C", "A"))))
    assert(approx(hm(("A", "C")), -1.0, 1e-10))
  }
}
