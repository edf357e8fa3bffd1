package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: time individual SparkEntry queries with the bench's
  * noop-sink methodology (N passes, min reported) without running the
  * whole Bench. Usage: runMain graft.QueryProbe <sfDir> <reps> <query...> */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries("q01_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warmup
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[query] $name: min ${times.min}%.3f s (all: ${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    spark.stop()
  }
}
