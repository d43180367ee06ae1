package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("defaults mirror the reference's knobs") {
    val c = PipelineConfig(indexName = "idx")
    assert(c.batchSize == 1000)        // IngestionConfig.java:47
    assert(c.batchTimeoutMs == 5000L)  // PaimonRowProcessor.java:48
    assert(c.workerThreads == 4)       // PaimonConfig.java:31
    assert(c.scanIntervalMs == 30000L) // PaimonConfig.java:34
    assert(c.checkpointTimeoutMinutes == 10L)
    assert(c.maxRetries == 3 && c.retryDelayMs == 5000L)
  }

  test("validation rejects empty index name and bad sizes") {
    assertThrows[IllegalArgumentException] { PipelineConfig(indexName = "") }
    assertThrows[IllegalArgumentException] {
      PipelineConfig(indexName = "x", batchSize = 0)
    }
  }

  test("dotted-path navigation over nested maps") {
    val cfg: Map[String, Any] = Map(
      "ingestion" -> Map(
        "kafka" -> Map("topic" -> "t1", "batchSize" -> 500)))
    assert(ConfigHelper.getString(cfg, "ingestion.kafka.topic", "?") == "t1")
    assert(ConfigHelper.getInt(cfg, "ingestion.kafka.batchSize", 0) == 500)
    assert(ConfigHelper.getPath(cfg, "ingestion.missing.topic").isEmpty)
    assert(ConfigHelper.getString(cfg, "nope", "dflt") == "dflt")
  }
}
