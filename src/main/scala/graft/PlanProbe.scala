package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the executed plan of registered queries.
  *
  *   runMain graft.PlanProbe [sfDir] [queryName...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("s2_incremental_scan", "q1_agg", "j3_top_orders", "x_sim_topk")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
