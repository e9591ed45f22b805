package graft.scale

import graft.Graft
import graft.dedup.Dedup
import graft.vector.VectorOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end embedding dedup-CLUSTER pipeline at replica scale over
  * BOTH candidate generators — closes the gap where the catalog's
  * d6/d7/d11 rows inherit the frozen 16×4 banding while the engine's
  * production default ([[VectorOps.nearDupPairsAuto]] → adaptive) was
  * priced only at the pair stage.
  *
  * For each variant (frozen banding, density-adaptive banding, exact
  * all-pairs truth): near-dup pairs → large-star/small-star connected
  * components → min-id keeper per cluster (the d1b/d7 keeper rule —
  * embeddings carry no quality score), reporting pair/cluster/keeper
  * counts, node-level recall of the truth clustering, and wall time per
  * stage. The adaptive row is the number a 100 TB pipeline should
  * expect; the frozen row is what the replayable catalog entry pays.
  *
  * Usage: runMain graft.scale.LshClusterScale <sfDir> [threshold=0.4]
  */
object LshClusterScale {

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

    /** pairs → CC clusters → keeper counts + clustered-node set. */
    def clusterStage(pairs: DataFrame): (DataFrame, Long, Long, Long, Double) = {
      val (cl, wall) = timed {
        val c = Graft.materialize(
          Dedup.connectedComponentsStars(pairs, "vec_a", "vec_b"))
        c.count()
        c
      }
      val nodes = cl.count() // every node that belongs to some cluster
      val clusters = cl.select("label").distinct().count()
      // keeper rule: min id per cluster survives; unclustered vectors
      // keep themselves → total keepers = n - (clustered - clusters)
      val keepers = n - (nodes - clusters)
      (cl, nodes, clusters, keepers, wall)
    }

    // --- Truth: exact all-pairs sweep.
    val (truthPairs, truthPairWall) = timed {
      val t = Graft.materialize(
        VectorOps.allPairsCosine(emb, threshold).select("vec_a", "vec_b"))
      t.count(); t
    }
    val nTruthPairs = truthPairs.count()
    val (truthCl, truthNodes, truthClusters, truthKeepers, truthClWall) =
      clusterStage(truthPairs)
    System.err.println(s"[lsh-clusters] truth: $nTruthPairs pairs, " +
      s"$truthClusters clusters / $truthNodes nodes, $truthKeepers keepers")

    def nodeRecall(cl: DataFrame): Double =
      if (truthNodes == 0) 1.0
      else cl.select("node").join(truthCl.select("node"), Seq("node"), "left_semi")
        .count().toDouble / truthNodes

    def run(name: String, mkPairs: => DataFrame): String = {
      val ((pairs, nPairs), pairWall) = timed {
        val p = Graft.materialize(mkPairs.select("vec_a", "vec_b"))
        (p, p.count())
      }
      val (cl, nodes, clusters, keepers, clWall) = clusterStage(pairs)
      val recall = nodeRecall(cl)
      System.err.println(f"[lsh-clusters] $name: $nPairs pairs " +
        f"(${pairWall}%.1fs), $clusters clusters / $nodes nodes " +
        f"(${clWall}%.1fs), $keepers keepers, node recall $recall%.4f")
      s""""$name":{"pairs":$nPairs,"pair_wall_s":${f"$pairWall%.2f"},""" +
        s""""clusters":$clusters,"clustered_nodes":$nodes,""" +
        s""""keepers":$keepers,"cluster_wall_s":${f"$clWall%.2f"},""" +
        s""""node_recall":${f"$recall%.5f"}}"""
    }

    // --- Frozen d5/d7 parameterization (16 × 4, corpus planes 8–71).
    val planes = emb.filter(col("vec_id") >= 8 && col("vec_id") < 72)
      .select(col("vec_id") - 8, col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val frozenJson = run("frozen", VectorOps.lshNearDupPairs(
      emb, planes, bands = 16, rowsPerBand = 4, threshold = threshold))

    // --- Production default: nearDupPairsAuto → adaptive banding.
    val adaptiveJson = run("adaptive", VectorOps.nearDupPairsAuto(emb, threshold))

    println(s"""{"metric":"lsh_cluster_eval","sf_dir":${jq(sfDir)},""" +
      s""""threshold":$threshold,"n_vectors":$n,""" +
      s""""truth":{"pairs":$nTruthPairs,"pair_wall_s":${f"$truthPairWall%.2f"},""" +
      s""""clusters":$truthClusters,"clustered_nodes":$truthNodes,""" +
      s""""keepers":$truthKeepers,"cluster_wall_s":${f"$truthClWall%.2f"}},""" +
      s"""$frozenJson,$adaptiveJson}""")
    spark.stop()
  }
}
