package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT/codegen/first-read costs land here, not on
    // whichever query happens to run first.
    try {
      spark.range(1 << 20).selectExpr("sum(id)").collect()
      Seq("lineitem", "orders", "events", "documents", "embeddings")
        .foreach(t => Graft.table(spark, sfDir, t).limit(1).count())
      // touch the heavyweight operator paths (window exec, typed
      // groupByKey codegen, generators, joins) so their one-time JIT
      // doesn't land on whichever query alphabetically runs them first
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val tiny = spark.range(64).select(col("id"), (col("id") % 4).as("k"))
      tiny.withColumn("r", row_number().over(
          Window.partitionBy("k").orderBy("id")))
        .select(explode(array(col("r"), col("r")))).count()
      tiny.as[(Long, Long)].groupByKey(_._2)
        .flatMapGroups((_, it) => it.map(_._1)).count()
      tiny.join(tiny.select(col("id").as("id2")), col("id") === col("id2"))
        .count()
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: materializes every column of every row (count() would let
      // Catalyst prune the plan down to a row count).
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
