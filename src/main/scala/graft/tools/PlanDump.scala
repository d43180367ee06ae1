package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

import graft.{SparkEntry, Tables}

/** Write `explain("formatted")` output for registered queries to files —
  * the plans/rNN evidence the optimization rounds commit. Run once from
  * the PRE-change commit (`git stash` the working tree) for the
  * `_before.txt` dumps and once from the changed tree for `_after.txt`,
  * so the before/after pair is honest (the r17 verdict's plan-hygiene
  * item: a "before" dumped from the changed binary proves nothing).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { q =>
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
        println(s"[plandump] wrote $outDir/${q}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $q failed: ${e.getMessage}")
      } finally SparkEntry.drainTempDirs()
    }
    spark.stop()
  }
}
