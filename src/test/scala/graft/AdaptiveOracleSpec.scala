package graft

import graft.operators.VectorQueries
import graft.vector.VectorOps

/** The d5a adaptive near-dup oracle gate rests on three shared
  * artifacts (planes parquet, integer-exact bits, engine-precomputed
  * bands/Hamming constants — VectorQueries.d5aNeardupAdaptive scaladoc).
  * This spec pins each one so drift fails HERE, loudly, before it can
  * desync the cross-engine replay. */
class AdaptiveOracleSpec extends SparkSpec {
  import spark.implicits._

  test("committed plane table == gaussianPlanes(seed 42) bit-for-bit") {
    val got = spark.read.parquet("data/adaptive_planes").orderBy("pid")
      .as[(Long, Seq[Double])].collect()
    assert(got.length == 6400, s"expected 6400 planes, found ${got.length}")
    val want = VectorOps.gaussianPlanes(42L, got.length, 64)
    got.foreach { case (pid, pe) =>
      assert(pe.length == 64, s"plane $pid: dim ${pe.length}")
      assert(pe.toArray.sameElements(want(pid.toInt)),
        s"plane $pid drifted from the generator — regenerate " +
          "data/adaptive_planes (AdaptivePlanesGen) or revert the formula")
    }
  }

  test("adaptiveBanding bits are integer-exact, incl. power-of-two boundaries") {
    // the gated corpora: sf0.01 (500 vecs) and the sf1 replicas (20000)
    assert(VectorOps.adaptiveBanding(500, 0.4) == ((11, 3)))
    assert(VectorOps.adaptiveBanding(20000, 0.4) == ((188, 9)))
    // n/occupancy an exact power of two — where a floating log2 could
    // flip the ceil either way, the integer form is pinned
    assert(VectorOps.adaptiveBanding(32768, 0.4)._2 == 9)
    assert(VectorOps.adaptiveBanding(32769, 0.4)._2 == 10)
    assert(VectorOps.sigMaxHamming(0.4, 1024, 4.0) == 439L)
  }

  test("d5a oracle SQL embeds the engine's own constants, never re-derives them") {
    val sql = VectorQueries.d5aNeardupAdaptiveSql
    assert(sql.contains(s"<= ${VectorOps.sigMaxHamming(0.4, 1024, 4.0)}"),
      "Hamming cut literal missing or stale")
    VectorOps.bandsByBits(0.4, 0.95).foreach { case (b, k) =>
      assert(sql.contains(s"($b,$k)"), s"bits→bands VALUES row ($b,$k) missing")
    }
    assert(sql.contains("data/adaptive_planes"), "oracle must read the shared planes")
    // the planes path is resolved from THIS checkout at SQL-build time
    // (user.dir / graft.repo.root), never hardcoded to one clone location
    val planesAbs = new java.io.File(
      sys.props.getOrElse("graft.repo.root", sys.props("user.dir")),
      "data/adaptive_planes").getAbsolutePath
    assert(sql.contains(s"read_parquet('$planesAbs/*.parquet')"),
      s"oracle planes path must resolve to this checkout ($planesAbs)")
    assert(new java.io.File(planesAbs).isDirectory,
      "resolved planes directory missing — run AdaptivePlanesGen")
    // the SQL carries its own fail-loudly coverage guard: a corpus whose
    // banding needs more planes than the committed table must error()
    // instead of silently truncating signatures under the Hamming cut
    assert(sql.contains("error('adaptive_planes table too small"),
      "SQL-side plane-coverage guard missing")
    // ... and a pid-CONTIGUITY guard: a partially regenerated table can
    // pass the COUNT(*) check while a pid-numbering gap silently drops
    // planes under `pid < bands*bits` — assert MAX(pid)+1 == COUNT(*)
    // fails loudly too (r10 ADVICE; fire-proof in scripts/guard_fire_check.py)
    assert(sql.contains("error('adaptive_planes pid numbering is not contiguous"),
      "SQL-side pid-contiguity guard missing")
  }

  test("lshNearDupAdaptive rejects null and mixed-dimension vectors loudly") {
    // a null embedding would NPE deep in the kernel and a mixed-dim
    // vector would silently flood band bucket 0 (all-zero codes) —
    // both must fail at the door instead
    val mixed = Seq((1L, Seq(1f, 2f)), (2L, Seq(1f, 2f, 3f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorOps.lshNearDupAdaptive(mixed, 0.4)
    }
    assert(e.getMessage.contains("non-uniform"))
    val withNull = Seq((1L, Some(Seq(1f, 2f))), (2L, None))
      .toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.lshNearDupAdaptive(withNull, 0.4)
    }
    assert(e2.getMessage.contains("null"))
  }

  test("committed plane budget covers every banding the gated corpora can request") {
    for (n <- Seq(500L, 2000L, 20000L, 65536L)) {
      val (bands, bits) = VectorOps.adaptiveBanding(n, 0.4)
      assert(bands.toLong * bits + 1024 <= 6400,
        s"n=$n requests ${bands.toLong * bits + 1024} planes > committed 6400 — " +
          "regenerate data/adaptive_planes with a larger count")
    }
  }
}
