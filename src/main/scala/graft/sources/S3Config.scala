package graft.sources

import org.apache.spark.sql.SparkSession

/** Catalog/warehouse S3 configuration translation (SURVEY §2.1 S4),
  * mirroring `PaimonIngestor.java:173-225`:
  *
  *   - an `s3a://` warehouse always gets the universal S3A tuning
  *     (connection pool 256, 128 threads, 64M blocks — the reference's
  *     hardcoded throughput settings);
  *   - an explicit `endpoint` in the s3 config block means a local/test
  *     object store → endpoint + static credentials + optional
  *     path-style access (SimpleAWSCredentialsProvider);
  *   - no endpoint means production → the default IAM provider chain.
  *
  * The reference's Paimon `FileIOLoader` for the `s3a://` scheme (S5,
  * `S3ALoader.java`) is unnecessary on Spark: Hadoop's `S3AFileSystem`
  * binds the scheme natively; only the conf keys below are needed.
  */
object S3Config {

  final case class S3Options(
      endpoint: Option[String] = None,
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      pathStyleAccess: Boolean = false)

  /** The `spark.hadoop.*`-level key/value pairs for a warehouse path. */
  def hadoopConf(warehousePath: String, s3: Option[S3Options]): Map[String, String] =
    if (!warehousePath.startsWith("s3a://")) Map.empty
    else {
      val universal = Map(
        "fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "fs.s3a.connection.maximum" -> "256",
        "fs.s3a.threads.max" -> "128",
        "fs.s3a.block.size" -> "64M")
      val env = s3 match {
        case Some(opts) if opts.endpoint.isDefined =>
          Map(
            "fs.s3a.endpoint" -> opts.endpoint.get,
            "fs.s3a.access.key" -> opts.accessKey.getOrElse(""),
            "fs.s3a.secret.key" -> opts.secretKey.getOrElse(""),
            "fs.s3a.aws.credentials.provider" ->
              "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider") ++
            (if (opts.pathStyleAccess) Map("fs.s3a.path.style.access" -> "true")
             else Map.empty)
        case _ =>
          Map("fs.s3a.aws.credentials.provider" ->
            "com.amazonaws.auth.DefaultAWSCredentialsProviderChain")
      }
      universal ++ env
    }

  /** Apply to a live session's Hadoop configuration. */
  def apply(spark: SparkSession, warehousePath: String,
      s3: Option[S3Options] = None): Unit =
    hadoopConf(warehousePath, s3).foreach { case (k, v) =>
      spark.sparkContext.hadoopConfiguration.set(k, v)
    }
}
