package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tools.Maintenance

/** The operator CLI's safety contract: read-only unless `--takeover`,
  * and the read-only path never touches the epoch ledger (so it can
  * never fence a live writer — the r14 verdict's zombie-maker hazard).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("default run is read-only: nothing deleted, no epoch claimed, writer stays live") {
    val dir = java.nio.file.Files.createTempDirectory("maint-ro").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v")); sink.commit()
    sink.addDocuments(Seq(("b", "v2")).toDF("_id", "v")); sink.commit()
    val f = DeltaLog.fs(spark, dir)
    val ledger = new org.apache.hadoop.fs.Path(s"$dir/${DeltaLog.EpochDir}")
    val claims = f.listStatus(ledger).length
    Maintenance.run(spark, "sink", dir, keep = 1, takeover = false)
    assert(sink.history() == Seq(0L, 1L)) // nothing deleted
    assert(f.listStatus(ledger).length == claims) // no new claim
    sink.addDocuments(Seq(("c", "v3")).toDF("_id", "v"))
    sink.commit() // the live writer was not fenced by the tool
    assert(sink.searchable().count() == 3)
  }

  test("PipelineRunner.maintain vacuums under the writer's own epoch with the config retention") {
    val dir = java.nio.file.Files.createTempDirectory("maint-runner").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    val runner = new graft.runtime.PipelineRunner(
      graft.config.PipelineConfig(indexName = "m-idx", keepVersions = 2), sink)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v")); sink.commit()
    sink.addDocuments(Seq(("a", "v2")).toDF("_id", "v")); sink.commit()
    sink.addDocuments(Seq(("a", "v3")).toDF("_id", "v")); sink.commit()
    val r = runner.maintain()
    assert(r.exists(!_.dryRun))
    assert(sink.history() == Seq(1L, 2L)) // keepVersions=2 from config
    sink.addDocuments(Seq(("b", "b1")).toDF("_id", "v"))
    sink.commit() // the writer was not fenced by its own maintenance
    assert(sink.searchable().count() == 2)
    // sinks without a vacuum surface are a no-op
    val mem = new InMemoryIndexSink(spark,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_id",
          org.apache.spark.sql.types.StringType))))
    val r2 = new graft.runtime.PipelineRunner(
      graft.config.PipelineConfig(indexName = "m2"), mem).maintain()
    assert(r2.isEmpty)
  }

  test("--takeover vacuums; unknown kinds are refused loudly") {
    val dir = java.nio.file.Files.createTempDirectory("maint-rw").toString
    val sink = new ParquetIndexSink(spark, dir, numBuckets = 4)
    sink.addDocuments(Seq(("a", "v1")).toDF("_id", "v")); sink.commit()
    sink.addDocuments(Seq(("a", "v2")).toDF("_id", "v")); sink.commit()
    Maintenance.run(spark, "sink", dir, keep = 1, takeover = true)
    assert(sink.history() == Seq(1L)) // pruned to the lease
    assert(sink.searchable().select("v").as[String].head() == "v2")
    val e = intercept[IllegalArgumentException](
      Maintenance.run(spark, "nope", dir, 1, takeover = false))
    assert(e.getMessage.contains("unknown store kind"))
  }
}
