package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity-search operators over an `Array[Float]` embedding
  * column (driver north-star): brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH bucketing and IVF coarse assignment as
  * the scale paths.
  *
  * All math is pure Column expressions (zip_with + aggregate folds in
  * double precision) — codegen-friendly, no UDFs.
  *
  * Scale: brute-force is O(n·q) pair evaluations — right for reranking
  * and small q; the LSH/IVF variants cut candidates by bucketing first
  * (broadcast the tiny plane/centroid set, one narrow map per vector,
  * then a bucket-keyed shuffle instead of a cross join).
  */
object VectorOps {

  private def d(x: Column): Column = x.cast("double")

  /** Σ aᵢ·bᵢ in double precision — native codegen'd Expression (a tight
    * fused loop inside whole-stage codegen; the HOF zip_with/aggregate
    * formulation evaluates its lambda interpreted per element and is
    * ~100× slower — see functions.VectorExpressions). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot_native(a, b)

  /** HOF reference implementation, kept for cross-checking the native
    * expression in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 on zero norm (mirrors the similarity module's
    * edge rule). Native codegen'd Expression. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_native(a, b)

  def cosineHof(a: Column, b: Column): Column = {
    val na = sqrt(dotHof(a, a))
    val nb = sqrt(dotHof(b, b))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dotHof(a, b) / (na * nb))
  }

  /** Brute-force exact top-k neighbors for each query vector. Ranking is
    * on the 6-dp-rounded score with id tiebreak, so results are
    * deterministic and engine-independent. */
  def knnBrute(vectors: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val v = vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
    val scored = v.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
    scored.withColumn("rank", row_number().over(
      Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** IVF coarse quantization: assign each vector to its nearest centroid
    * by cosine (argmax on rounded score, centroid-id tiebreak). */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = broadcast(centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("cv")))
    vectors.select(col(idCol).as("id"), col(vecCol).as("v"))
      .crossJoin(c)
      .withColumn("cos", round(cosine(col("v"), col("cv")), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("id").orderBy(col("cos").desc, col("centroid_id"))))
      .filter(col("rk") === 1)
      .select(col("id").as(idCol), col("centroid_id"), col("cos"))
  }

  /** IVF search end-to-end: restrict each query to its `nprobe` nearest
    * centroids' buckets, then exact-rerank within the candidates. The
    * scale path for ANN: the brute-force sweep drops from O(n·q) to
    * O(n·q·nprobe/k_centroids) expected, at a recall cost bounded by the
    * quantizer (IvfSearchSpec measures recall against knnBrute). */
  def ivfSearch(vectors: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val index = ivfAssign(vectors, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"))
      .join(vectors.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")),
        "neighbor_id")
    val c = broadcast(centroids.select(col(idCol).as("centroid_id"), col(vecCol).as("cv")))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(c)
      .withColumn("ccos", round(cosine(col("qv"), col("cv")), 6))
      .withColumn("crk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ccos").desc, col("centroid_id"))))
      .filter(col("crk") <= nprobe)
      .select("query_id", "qv", "centroid_id")
    probes.join(index, "centroid_id")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  /** All-pairs cosine near-dup pairs (a < b, rounded cos ≥ threshold).
    *
    * SMALL-INPUT FALLBACK ONLY — the default near-dup path is the
    * bucketed [[lshNearDupPairs]]; use this exact sweep when the vector
    * set is small enough that O(n²) is cheaper than bucketing (see
    * [[nearDupPairs]] for the dispatcher), or as the recall oracle in
    * tests.
    *
    * Implementation note: Catalyst higher-order functions (zip_with +
    * aggregate) are interpreted per element, which makes an O(n²·d)
    * pair sweep ~100× slower than a JIT'd loop. The vector set is
    * broadcast (ids + double vectors + precomputed norms) and each
    * partition runs a tight dot-product loop against it — the classic
    * broadcast-small-side pattern. Works while the vector set fits in
    * executor memory (64-dim floats: ~3 GB per 10M vectors); beyond
    * that it is off the table, which is why it is not the default.
    *
    * Numerics match the expression form exactly: left-to-right double
    * folds, cos = dot/(‖a‖·‖b‖), HALF_UP rounding to 6 dp; pairs with
    * mismatched lengths are skipped (the expression form yields null
    * there, which can never pass the threshold). */
  def allPairsCosine(vectors: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val ds = vectors
      .select(col(idCol).cast("long").as("_1"), col(vecCol).as("_2"))
      .as[(Long, Seq[Float])]
    val local = ds.collect().sortBy(_._1).map { case (id, v) =>
      val d = new Array[Double](v.length)
      var i = 0
      var n2 = 0.0
      while (i < v.length) { d(i) = v(i).toDouble; n2 += d(i) * d(i); i += 1 }
      (id, d, math.sqrt(n2))
    }
    val bc = spark.sparkContext.broadcast(local)
    val round6 = (x: Double) =>
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    ds.mapPartitions { it =>
      val all = bc.value
      it.flatMap { case (ia, va) =>
        val a = new Array[Double](va.length)
        var i = 0
        var na2 = 0.0
        while (i < va.length) { a(i) = va(i).toDouble; na2 += a(i) * a(i); i += 1 }
        val na = math.sqrt(na2)
        all.iterator
          .filter(p => p._1 > ia && p._2.length == a.length)
          .flatMap { case (ib, b, nb) =>
            var s = 0.0
            var j = 0
            while (j < a.length) { s += a(j) * b(j); j += 1 }
            val cos = if (na == 0.0 || nb == 0.0) 0.0 else round6(s / (na * nb))
            if (cos >= threshold) Some((ia, ib, cos)) else None
          }
      }
    }.toDF("vec_a", "vec_b", "cos")
  }

  /** Random-hyperplane LSH: bucket id from the sign bits of dot products
    * against `planes` (any fixed small vector set). */
  def lshBucket(vectors: DataFrame, planes: Seq[(Long, Seq[Float])],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = planes.sortBy(_._1).zipWithIndex.map { case ((_, plane), i) =>
      val planeCol = array(plane.map(v => lit(v)): _*)
      when(dot(col(vecCol), planeCol) > 0, 1L << i).otherwise(0L)
    }
    vectors.select(col(idCol), bits.reduce(_ + _).as("bucket"))
  }

  /** Banded-LSH near-dup pairs — the DEFAULT scale path for embedding
    * near-duplicate detection (a < b, rounded cos ≥ threshold).
    *
    * Plan shape (never O(n²) over the corpus):
    *  1. one narrow map per vector computes `bands` bucket keys, each the
    *     sign-bit code of `rowsPerBand` hyperplane dot products (planes
    *     broadcast as literals — `bands·rowsPerBand` dots/vector total);
    *  2. a (band, bucket)-keyed self-join materializes candidate pairs
    *     only WITHIN buckets;
    *  3. exact cosine rerank over the candidates, threshold filter.
    *
    * Recall follows the classic banding curve 1 − (1 − p^r)^b with
    * p = 1 − θ/π: for true near-dups (cos ≥ 0.9, r=4, b=16) it is
    * ≈ 0.9999; it degrades gracefully toward weaker thresholds
    * (VectorSpec measures it against [[allPairsCosine]] on planted
    * near-dups). Fully deterministic given the plane set, so a SQL
    * oracle replays it exactly. */
  def lshNearDupPairs(vectors: DataFrame, planes: Seq[(Long, Seq[Float])],
      bands: Int, rowsPerBand: Int, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(planes.size >= bands * rowsPerBand,
      s"need ${bands * rowsPerBand} planes, got ${planes.size}")
    val sorted = planes.sortBy(_._1).take(bands * rowsPerBand)
    // Exact-dup collapse (graft.dedup.ExactCollapse): bucket codes and
    // the rerank cosine are functions of the embedding VALUE only, so
    // value-identical vectors collapse to one representative before the
    // bucket join — without this, a class of n identical vectors
    // collides in every band and alone makes the join O(n²).
    val base = vectors.select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"))
    val tagged = graft.dedup.ExactCollapse.tag(base, "id", Seq(col("__v")))
    val reps = graft.dedup.ExactCollapse.reps(tagged, "id")
    val mem = graft.dedup.ExactCollapse.members(tagged, "id")
    // all band keys in ONE pass over the rep vectors (an array of bucket
    // codes, unpivoted), not one scan per band
    val bucketCols = (0 until bands).map { b =>
      (0 until rowsPerBand).map { r =>
        val planeCol = array(sorted(b * rowsPerBand + r)._2.map(v => lit(v)): _*)
        when(dot(col("__v"), planeCol) > 0, 1L << r).otherwise(0L)
      }.reduce(_ + _)
    }
    // materialized once: the (id, band, bucket) frame feeds BOTH sides of
    // the candidate self-join — without this the scan + bands·rowsPerBand
    // dot products run twice
    val banded = graft.Graft.materialize(
      reps.select(col("id"),
        posexplode(array(bucketCols: _*)).as(Seq("band", "bucket"))))
    val cand = banded.as("x").join(banded.as("y"), Seq("band", "bucket"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("vec_a"), col("y.id").as("vec_b"))
      .distinct()
      // in-group duplicate pairs surface via rep self-pairs, not buckets;
      // the rerank below scores them with the same cosine expression (and
      // drops e.g. identical zero vectors exactly as the bucket path would)
      .unionByName(graft.dedup.ExactCollapse.dupSelfPairs(mem, "vec_a", "vec_b"))
    val va = reps.select(col("id").as("vec_a"), col("__v").as("__va"))
    val vb = reps.select(col("id").as("vec_b"), col("__v").as("__vb"))
    val scored = cand.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
    graft.dedup.ExactCollapse.expand(scored, mem, "vec_a", "vec_b")
  }

  /** Near-dup dispatcher: the exact O(n²) sweep only under
    * `bruteForceLimit` vectors (where it is cheaper than bucketing);
    * banded LSH + rerank — the scale path — otherwise. The size probe
    * is `limit(bruteForceLimit + 1).count()` — it stops scanning as
    * soon as limit+1 rows are seen, so dispatch costs O(limit) rows,
    * not a full O(n) pass over 100 TB just to pick a branch. */
  def nearDupPairs(vectors: DataFrame, threshold: Double,
      planes: Seq[(Long, Seq[Float])], bands: Int, rowsPerBand: Int,
      bruteForceLimit: Long = 10000L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    if (vectors.limit((bruteForceLimit + 1).toInt).count() <= bruteForceLimit)
      allPairsCosine(vectors, threshold, idCol, vecCol)
    else
      lshNearDupPairs(vectors, planes, bands, rowsPerBand, threshold, idCol, vecCol)
}
