package graft.examples

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.cdc.Changelog
import graft.config.PipelineConfig
import graft.runtime.PipelineRunner
import graft.sink.{DocQueries, ParquetIndexSink}

/** End-to-end example of the ingestion engine: the events table treated as
  * a CDC changelog, streamed through the micro-batch runner into a keyed
  * index sink, then served with the reference's query shapes.
  *
  *   runMain graft.examples.IngestPipeline [sfDir] [indexDir]
  */
object IngestPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val indexDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-index").toString)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-ingest")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config(Tables.nanosAsLongConf, "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = PipelineConfig(
      indexName = "events-index",
      sourcePath = sfDir,
      scanIntervalMs = 500L,
      checkpointLocation =
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)

    val sink = new ParquetIndexSink(spark, indexDir)
    val runner = new PipelineRunner(cfg, sink,
      dlq = Some(bad => println(s"[dlq] ${bad.count()} poison rows")))

    // events → RowKind changelog (same fixture mapping the oracle-checked
    // c1/c2/c7 queries use)
    val changelog = SparkEntry.eventsChangelog(spark, sfDir)
      .drop("ts") // keep the schema streaming-source friendly

    // stage the changelog as a file stream (stands in for Kafka/Paimon)
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stage").toString
    changelog.write.mode("overwrite").parquet(stageDir)
    val stream = spark.readStream.schema(
      changelog.schema).parquet(stageDir)

    val query = runner.runStream(stream, "op", "user_id", Seq(col("ts_us"), col("event_id")))
    query.processAllAvailable()
    query.stop()

    val index = sink.searchable()
    println(s"[pipeline] ${runner.metrics.summary}")
    println(s"[index] live docs: ${index.count()}")
    println(s"[query] purchases: " +
      DocQueries.term(index, "event_type", "purchase").count())
    println(s"[query] clicks+views: " +
      DocQueries.termInSet(index, "event_type", Seq("click", "view")).count())
    spark.stop()
  }
}
