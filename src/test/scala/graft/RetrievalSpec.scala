package graft

import graft.operators.RetrievalQueries
import org.apache.spark.sql.functions._

/** Structural invariants for the retrieval / sketch-algebra family
  * (t30–t33). The DuckDB oracle is the value-level check; these tests
  * pin the properties that must hold at ANY scale. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("t30 inverted index: df band enforced, postings capped at 10 and ascending") {
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val rows = RetrievalQueries.t30InvertedIndex(spark, dir)
      .select("term", "df", "postings").as[(String, Long, String)].collect()
    assert(rows.size > 10, s"bigram index should have real breadth, got ${rows.size}")
    rows.foreach { case (term, df, postings) =>
      assert(df >= 2 && df <= nDocs / 2.0, s"$term df=$df outside band")
      assert(term.contains(" "), s"$term is not a bigram")
      val ids = postings.split(",").map(_.toLong)
      assert(ids.length <= 10 && ids.length <= df, s"$term postings=${ids.length}")
      assert(ids.sameElements(ids.sorted), s"$term postings not ascending")
    }
    // df is the TRUE document frequency even when postings are truncated
    val hot = rows.filter(_._2 > 10)
    hot.foreach { case (t, df, p) =>
      assert(p.split(",").length == 10, s"$t df=$df should truncate postings to 10")
    }
  }

  test("t31 entropy: bounds 0 <= H <= ln(n_tokens), ttr in (0,1]") {
    val rows = RetrievalQueries.t31Entropy(spark, dir)
      .select("n_tokens", "n_types", "entropy_nats", "ttr")
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, v, h, ttr) =>
      assert(h >= -1e-6, s"entropy $h negative")
      assert(h <= math.log(n.toDouble) + 1e-6, s"entropy $h exceeds ln($n)")
      assert(ttr > 0 && ttr <= 1.0 + 1e-9, s"ttr $ttr out of range")
      assert(v <= n, s"types $v > tokens $n")
      // single-type doc has zero entropy; all-distinct doc has ln(n)
      if (v == 1) assert(math.abs(h) <= 1e-6)
      if (v == n) assert(approx(h, math.floor(math.log(n.toDouble) * 1e6 + 0.5) / 1e6, 1e-9))
    }
  }

  test("t32 priority sample: <=5 per source, weighted key is reproducible") {
    val df = RetrievalQueries.t32PrioritySample(spark, dir)
    val per = df.groupBy("source").count().as[(String, Long)].collect()
    assert(per.nonEmpty && per.forall(_._2 <= 5))
    // determinism: two runs pick the identical sample
    val a = df.select("source", "doc_id").as[(String, Long)].collect().toSet
    val b = RetrievalQueries.t32PrioritySample(spark, dir)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(a == b)
    // ranks are 1..k dense per source
    val rks = df.groupBy("source").agg(collect_list("rk")).as[(String, Seq[Long])].collect()
    rks.foreach { case (s, r) => assert(r.sorted == (1L to r.size), s"$s ranks $r") }
  }

  test("t33 KMV set ops: estimates track exact counts within sketch error") {
    val r = RetrievalQueries.t33KmvSetops(spark, dir)
      .select("k", "n_a", "n_b", "n_union", "est_a", "est_b", "est_union", "est_intersect")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    val (k, na, nb, nu, ea, eb, eu, ei) = r
    assert(na + nb >= nu, "membership bits must cover the union")
    if (nu <= k) {
      // small-side exact branch
      assert(ea == na.toDouble && eb == nb.toDouble && eu == nu.toDouble)
      assert(ei == (na + nb - nu).toDouble)
    } else {
      // KMV standard error is ~1/sqrt(k-2) ≈ 9% at k=128; allow 4 sigma
      val tol = 4.0 / math.sqrt(k - 2.0)
      assert(math.abs(eu - nu) <= tol * nu, s"est_union $eu vs $nu")
      assert(math.abs(ea - na) <= tol * nu + 1, s"est_a $ea vs $na")
      assert(math.abs(eb - nb) <= tol * nu + 1, s"est_b $eb vs $nb")
      assert(ei >= -1e-9 && ei <= math.min(na, nb) + tol * nu, s"est_intersect $ei")
    }
  }
}
