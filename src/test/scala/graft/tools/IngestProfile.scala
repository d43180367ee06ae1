package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.SparkEntry

/** Test-scope profiling main for the ingest pipeline: times each
  * `processBatch` phase separately so sink changes can be iterated without
  * a full bench run. `sbt "Test/runMain graft.tools.IngestProfile"`.
  */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm the relation caches + codegen once
    SparkEntry.eventsChangelog(spark, sfDir).count()

    (1 to 3).foreach { round =>
      println(s"--- round $round ---")
      val dir = java.nio.file.Files.createTempDirectory("prof-index").toString
      val sink = new graft.sink.ParquetIndexSink(spark, dir)
      val runner = new graft.runtime.PipelineRunner(
        graft.config.PipelineConfig(indexName = "prof-idx"), sink)
      val docs = time("processBatch (commit 1)") {
        runner.processBatch(SparkEntry.eventsChangelog(spark, sfDir),
          "op", "user_id", Seq(col("ts_us"), col("event_id")))
      }
      println(s"[profile] docs=$docs")
      // second commit: now prevBuckets is non-empty → prune + merge path
      time("processBatch (commit 2)") {
        runner.processBatch(SparkEntry.eventsChangelog(spark, sfDir),
          "op", "user_id", Seq(col("ts_us"), col("event_id")))
      }
    }
    spark.stop()
  }
}
