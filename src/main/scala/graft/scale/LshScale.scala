package graft.scale

import graft.Graft
import graft.vector.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall/cost eval for embedding near-dup banding at replica scale —
  * the d9/v10 pattern applied to the adaptive path: run the EXACT
  * all-pairs sweep as ground truth, then the frozen d5 banding
  * (16 bands × 4 bits, corpus planes — the catalog's oracle-replayable
  * parameterization) and the density-adaptive banding
  * ([[VectorOps.lshNearDupAdaptive]]) against it, and report, per
  * variant: exact-cosine rerank volume, found pairs, recall vs truth,
  * and wall time. This is the artifact that prices the sf1-jitter d5
  * cliff (SCALE_r07.md §5: 127.9 M reranks for a 177 k-pair answer)
  * against the adaptive fix at equal-or-better recall.
  *
  * Usage: runMain graft.scale.LshScale <sfDir> [threshold=0.4]
  */
object LshScale {

  private def jq(s: String): String = "\"" + s + "\""

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val threshold = if (args.length > 1) args(1).toDouble else 0.4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Graft.table(spark, sfDir, "embeddings")
    val n = emb.count()

    // --- Ground truth: exact all-pairs sweep (broadcast JIT'd loop).
    val (truth, truthWall) = timed {
      val t = Graft.materialize(
        VectorOps.allPairsCosine(emb, threshold).select("vec_a", "vec_b"))
      (t, t.count())
    }
    val (truthDf, nTruth) = truth
    System.err.println(s"[lsh-scale] truth: $nTruth pairs in ${f"$truthWall%.1f"}s")

    def recallOf(found: DataFrame): Double =
      if (nTruth == 0) 1.0
      else found.select("vec_a", "vec_b")
        .join(truthDf, Seq("vec_a", "vec_b"), "left_semi").count().toDouble / nTruth

    // --- Frozen d5 parameterization (16 × 4, corpus planes vec_id 8–71).
    // Rerank volume = the rep-level candidate set the fixed pipeline
    // scores — recomputed here from the same public pieces so the count
    // is exactly what lshNearDupPairs evaluates cosines over.
    val planes = emb.filter(col("vec_id") >= 8 && col("vec_id") < 72)
      .select(col("vec_id") - 8, col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (frozenCand, frozenCandWall) = timed {
      import graft.dedup.ExactCollapse
      val base = emb.select(col("vec_id").cast("long").as("id"),
        col("embedding").as("__v"))
      val tagged = ExactCollapse.tag(base, "id", Seq(col("__v")))
      val reps = ExactCollapse.reps(tagged, "id")
      val mem = ExactCollapse.members(tagged, "id")
      val sorted = planes.sortBy(_._1).take(64)
      val bucketCols = (0 until 16).map { b =>
        (0 until 4).map { r =>
          val planeCol = array(sorted(b * 4 + r)._2.map(v => lit(v)): _*)
          when(VectorOps.dot(col("__v"), planeCol) > 0, 1L << r).otherwise(0L)
        }.reduce(_ + _)
      }
      val banded = Graft.materialize(reps.select(col("id"),
        posexplode(array(bucketCols: _*)).as(Seq("band", "bucket"))))
      banded.as("x").join(banded.as("y"), Seq("band", "bucket"))
        .filter(col("x.id") < col("y.id"))
        .select(col("x.id").as("vec_a"), col("y.id").as("vec_b"))
        .distinct()
        .unionByName(ExactCollapse.dupSelfPairs(mem, "vec_a", "vec_b"))
        .count()
    }
    val (frozenRun, frozenWall) = timed {
      val f = Graft.materialize(VectorOps.lshNearDupPairs(
        emb, planes, bands = 16, rowsPerBand = 4, threshold = threshold))
      (f, f.count())
    }
    val (frozenDf, frozenFound) = frozenRun
    val frozenRecall = recallOf(frozenDf)
    System.err.println(s"[lsh-scale] frozen: $frozenFound pairs, " +
      s"recall ${f"$frozenRecall%.4f"}, rerank $frozenCand, ${f"$frozenWall%.1f"}s")

    // --- Adaptive banding (library default parameters).
    val (adaptive, adaptiveWall) = timed {
      val run = VectorOps.lshNearDupAdaptive(emb, threshold)
      val pairsM = Graft.materialize(run.pairs)
      (run, pairsM, pairsM.count())
    }
    val (run, adaptiveDf, adaptiveFound) = adaptive
    val adaptiveRecall = recallOf(adaptiveDf)
    val candCount = run.candidates.count()
    val rerankCount = run.prefiltered.count()
    System.err.println(s"[lsh-scale] adaptive: $adaptiveFound pairs, " +
      s"recall ${f"$adaptiveRecall%.4f"}, cand $candCount, rerank $rerankCount, " +
      s"${f"$adaptiveWall%.1f"}s")

    println(s"""{"metric":"lsh_adaptive_eval","sf_dir":${jq(sfDir)},""" +
      s""""threshold":$threshold,"n_vectors":$n,""" +
      s""""truth":{"pairs":$nTruth,"wall_s":${f"$truthWall%.2f"}},""" +
      s""""frozen":{"bands":16,"bits_per_band":4,"rerank_pairs":$frozenCand,""" +
      s""""cand_wall_s":${f"$frozenCandWall%.2f"},"found":$frozenFound,""" +
      s""""recall":${f"$frozenRecall%.5f"},"wall_s":${f"$frozenWall%.2f"}},""" +
      s""""adaptive":{"bands":${run.bands},"bits_per_band":${run.bitsPerBand},""" +
      s""""sig_bits":${run.sigBits},"max_hamming":${run.maxHamming},""" +
      s""""cand_pairs":$candCount,"rerank_pairs":$rerankCount,""" +
      s""""found":$adaptiveFound,"recall":${f"$adaptiveRecall%.5f"},""" +
      s""""predicted_recall":${f"${run.predictedRecall}%.5f"},""" +
      s""""wall_s":${f"$adaptiveWall%.2f"}}}""")
    spark.stop()
  }
}
