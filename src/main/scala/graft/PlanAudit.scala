package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for the queries whose shape
  * matters at scale, so pushdown / broadcast / codegen can be inspected
  * (the ".explain and iterate" loop — see PLANS.md for findings). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // override with SPARK_GRAFT_PLAN_SF to audit the plan at another
    // scale (join-strategy gates are size-dependent)
    val dir = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q02_join_agg", "q05_anti_join", "q01_agg", "dd_minhash_lsh", "sim_ann_topk")
    names.foreach { n =>
      println(s"\n================ $n ================")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
