package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors PaimonIngestorS3ConfigTest: per-environment option translation. */
class S3ConfigSpec extends AnyFunSuite {

  test("non-s3a warehouse gets no s3 configuration") {
    assert(S3Config.hadoopConf("file:///tmp/wh", None).isEmpty)
    assert(S3Config.hadoopConf("hdfs://nn/wh", None).isEmpty)
  }

  test("s3a warehouse always gets the universal tuning") {
    val c = S3Config.hadoopConf("s3a://bucket/wh", None)
    assert(c("fs.s3a.connection.maximum") == "256")
    assert(c("fs.s3a.threads.max") == "128")
    assert(c("fs.s3a.block.size") == "64M")
  }

  test("endpoint configured → test env: static creds + optional path style") {
    val c = S3Config.hadoopConf("s3a://bucket/wh", Some(S3Config.S3Options(
      endpoint = Some("http://localhost:9090"),
      accessKey = Some("ak"), secretKey = Some("sk"), pathStyleAccess = true)))
    assert(c("fs.s3a.endpoint") == "http://localhost:9090")
    assert(c("fs.s3a.access.key") == "ak")
    assert(c("fs.s3a.path.style.access") == "true")
    assert(c("fs.s3a.aws.credentials.provider").contains("SimpleAWSCredentialsProvider"))
  }

  test("no endpoint → production env: IAM default provider chain") {
    val c = S3Config.hadoopConf("s3a://bucket/wh", Some(S3Config.S3Options()))
    assert(c("fs.s3a.aws.credentials.provider")
      .contains("DefaultAWSCredentialsProviderChain"))
    assert(!c.contains("fs.s3a.endpoint"))
  }
}
