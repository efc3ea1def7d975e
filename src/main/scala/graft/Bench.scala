package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: touch each table once so codegen/parquet-reader/JIT
    // startup cost isn't attributed to whichever query runs first
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    // ...and exercise the physical machinery (shuffle exchange, hash
    // join/agg, sort, window codegen) once on the 25-row dims so the
    // first timed query doesn't pay one-time JIT/codegen-cache cost
    try {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      Tables(spark, sfDir, "nation")
        .join(Tables(spark, sfDir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(lit(1)).orderBy(col("n").desc, col("r_name"))))
        .orderBy(col("rk")).count()
    } catch { case _: Throwable => () }
    // sorted order: Map iteration order is arbitrary and would shift
    // residual warmup between queries run-to-run / round-to-round
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
