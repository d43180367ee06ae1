package graft.tools

import org.apache.spark.sql.SparkSession

/** Test-scope debugging main: print the optimized + executed plan of one
  * registered query (or an ad-hoc probe) so plan-shape work can iterate
  * without a spec cycle. `sbt "Test/runMain graft.tools.PlanDump <name>"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config(graft.Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = args.headOption match {
      case Some("winnow") =>
        graft.operators.Dedup.winnowingFingerprints(
          spark.range(3).selectExpr("id", "'a b c d e f g h' as text"),
          "id", "text")
      case Some("mask") =>
        graft.operators.Corpus.maskTokens(
          spark.range(3).selectExpr("id", "'a b c d e' as text"),
          "id", "text", 300)
      case Some(name) =>
        val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
        graft.SparkEntry.queries(name)(spark, sfDir)
      case None => sys.error("usage: PlanDump <queryName|winnow|mask>")
    }
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.toString)
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
