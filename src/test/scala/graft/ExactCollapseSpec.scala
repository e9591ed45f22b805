package graft

import graft.dedup.{Dedup, ExactCollapse}
import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** Equivalence proofs for the exact-duplicate collapse prefix
  * (dedup.ExactCollapse): each collapsed kernel must emit the
  * byte-identical pair set a duplicate-oblivious implementation would —
  * verified against brute-force recomputation on corpora built to be
  * duplicate-heavy (the input class that makes the bucket joins
  * quadratic and motivated the collapse in the first place). */
class ExactCollapseSpec extends SparkSpec {
  import spark.implicits._

  test("expand enumerates in-group combinations once and orients cross pairs") {
    val members = Seq((1L, 1L), (1L, 4L), (1L, 9L), (7L, 7L), (10L, 10L), (10L, 2L))
      .toDF("__rep", "__member")
    // self pair on group 1 {1,4,9}; cross pair (7, 10) where member 2 < 7
    val repPairs = Seq((1L, 1L, 0.5), (7L, 10L, 0.9)).toDF("a", "b", "s")
    val got = ExactCollapse.expand(repPairs, members, "a", "b")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 4L, 0.5), (1L, 9L, 0.5), (4L, 9L, 0.5),
      (2L, 7L, 0.9), (7L, 10L, 0.9)))
  }

  test("dupSelfPairs only fires for groups of >= 2") {
    val members = Seq((1L, 1L), (1L, 4L), (7L, 7L)).toDF("__rep", "__member")
    val got = ExactCollapse.dupSelfPairs(members, "a", "b")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  // word-level edit distance for the brute-force oracle
  private def editDist(a: Seq[String], b: Seq[String]): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val t = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    dp(a.length)
  }

  test("deletionNeighborPairs under heavy duplication == brute-force edit<=1") {
    val texts = Seq(
      "the quick brown fox", "the quick brown fox jumps", "the quick red fox",
      "a completely different sentence here", "the quick brown", "short",
      "short", "Short  ") // normalization: case + whitespace runs
    // every text duplicated 3x with distinct ids
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      (0 until 3).map(r => (100L * r + i, t))
    }.toDF("doc_id", "text")
    val got = Dedup.deletionNeighborPairs(docs)
      .as[(Long, Long)].collect().toSet
    val norm = texts.zipWithIndex.flatMap { case (t, i) =>
      (0 until 3).map(r => (100L * r + i,
        t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ").toSeq))
    }
    val want = (for {
      (ia, wa) <- norm; (ib, wb) <- norm
      if ia < ib && editDist(wa, wb) <= 1
    } yield (ia, ib)).toSet
    assert(got == want)
  }

  test("ngramJaccard under heavy duplication == brute-force jaccard, maxDf applied") {
    val texts = Seq(
      "w1 w2 w3 w4 w5 w6", "w1 w2 w3 w4 w5 zz", "w1 w2 w3",
      "q1 q2 q3 q4 q5 q6", "hot hot hot hot hot")
    val docs = texts.zipWithIndex.flatMap { case (t, i) =>
      (0 until 4).map(r => (100L * r + i, t))
    }.toDF("doc_id", "text")
    val maxDf = 8 // caps shingles present in ALL dup groups of >2 classes
    val got = Dedup.ngramJaccard(docs, 3, 0.2, maxDf = maxDf)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b, math.rint(j * 1e9) / 1e9) }.toSet
    // brute force with the same df cap over the same shingle universe
    val sets = texts.zipWithIndex.flatMap { case (t, i) =>
      val ws = t.toLowerCase.trim.replaceAll("\\s+", " ").split(" ")
      val sh = ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      (0 until 4).map(r => (100L * r + i, sh))
    }
    val df = sets.flatMap(_._2.map(_ -> 1)).groupBy(_._1).map { case (k, v) => k -> v.size }
    val capped = sets.map { case (id, sh) => (id, sh.filter(df(_) <= maxDf)) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- capped; (ib, sb) <- capped
      if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.2
    } yield (ia, ib, math.rint(j * 1e9) / 1e9)).toSet
    assert(got == want)
  }

  test("lshNearDupPairs under heavy duplication: dup pairs all present at cos 1.0, " +
    "values match the brute-force sweep") {
    val rnd = new scala.util.Random(7)
    val uniq = (0 until 12).map(i =>
      (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val vecs = uniq.flatMap { case (id, v) =>
      (0 until 3).map(r => (100L * r + id, v))
    }.toDF("vec_id", "embedding")
    val planes = (0 until 16).map(p =>
      (p.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val got = VectorOps.lshNearDupPairs(vecs, planes, bands = 4, rowsPerBand = 4,
      threshold = 0.4).as[(Long, Long, Double)].collect().toSet
    // every exact-duplicate pair must surface (identical vectors share all bands)
    for (id <- 0 until 12; ra <- 0 until 3; rb <- ra + 1 until 3)
      assert(got.exists { case (a, b, c) =>
        a == 100L * ra + id && b == 100L * rb + id && c == 1.0 },
        s"missing dup pair of unique vector $id (reps $ra,$rb)")
    // and every emitted pair must carry the exact brute-force cosine
    val brute = VectorOps.allPairsCosine(vecs, 0.4)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    got.foreach { case (a, b, c) =>
      assert(brute.get((a, b)).contains(c), s"pair ($a,$b) cos $c != brute ${brute.get((a, b))}")
    }
  }
}
