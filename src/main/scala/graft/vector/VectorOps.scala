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

  /** Σ aᵢ·bᵢ in double precision, sequential fold (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 on zero norm (mirrors the similarity module's
    * edge rule). */
  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
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
      .select("query_id", "neighbor_id", "cos", "rank")
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
}
