package graft.sink

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

import graft.cdc.Changelog

/** The sink contract the reference engine drives (SURVEY §2.6): exactly
  * four operations against a keyed index —
  * `addDocuments` (upsert by `_id`), `commit`, `deleteByQuery`
  * (key-set delete), and the `_id` field definition.
  *
  * Implementations must make re-adding an existing `_id` replace the old
  * document (Lucene `updateDocument` semantics — E2E-asserted by the
  * reference: final version wins across snapshots, INSERT→DELETE→INSERT
  * leaves exactly one doc). That upsert idempotence is what makes
  * at-least-once replay safe (SURVEY §7.4 risk 3).
  */
trait IndexSink {
  def idField: String = "_id"

  /** Upsert a batch of documents keyed by [[idField]]. Returns a
    * monotonically increasing sequence number (reference: Lucene seqnum).
    */
  def addDocuments(docs: DataFrame): Long

  /** Delete every document whose id is in the set (TermInSetQuery). */
  def deleteByIds(ids: Seq[String]): Unit

  /** Delete by a distributed key set — the scale path for unbounded
    * delete batches (no driver materialization). Default falls back to
    * the bounded-id form; MERGE-capable sinks override with an anti-join.
    */
  def deleteByKeys(ids: DataFrame): Unit = {
    val c = ids.columns.head
    // drop null keys: String.valueOf(null) would delete a document whose
    // id is literally "null"
    deleteByIds(ids.select(c).filter(col(c).isNotNull).distinct()
      .collect().map(r => String.valueOf(r.get(0))).toSeq)
  }

  /** Make all preceding adds/deletes durable + visible. */
  def commit(): Unit

  /** Current committed view of the index. */
  def searchable(): DataFrame
}

/** Driver-side keyed store for tests: a plain map guarded by a lock.
  * Mirrors the reference's E2E in-process index. NOT a scale path — the
  * scale path is [[ParquetIndexSink]] / any MERGE-capable table format.
  */
final class InMemoryIndexSink(spark: SparkSession, schema: org.apache.spark.sql.types.StructType)
    extends IndexSink {
  private val store = scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.Row]()
  private var committed: Seq[org.apache.spark.sql.Row] = Nil
  private var seq = 0L

  override def addDocuments(docs: DataFrame): Long = synchronized {
    val idIdx = docs.schema.fieldIndex(idField)
    docs.collect().foreach { r => store(r.getString(idIdx)) = r; seq += 1 }
    seq
  }
  override def deleteByIds(ids: Seq[String]): Unit = synchronized {
    ids.foreach(store.remove)
  }
  override def commit(): Unit = synchronized { committed = store.values.toSeq }
  override def searchable(): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(committed.toList), schema)
}

/** Scale-path sink: a key-hash-BUCKETED parquet index with an append-only
  * manifest log, merged with the relational MERGE from [[Changelog]].
  *
  * Layout under `path`:
  * {{{
  *   _manifests/v{N}.json            // append-only commit log; max N = current
  *   data/c{N}-{attempt}/gbucket={B}/... // immutable per-commit-attempt parquet
  * }}}
  *
  * Each commit:
  *   1. computes the set of buckets touched by the pending ops' keys
  *      (one tiny distinct-aggregate job — at most `numBuckets` ints),
  *   2. reads ONLY those buckets' current files (manifest-pruned),
  *   3. applies the ops in call order and writes the merged buckets to a
  *      fresh `data/c{N}` dir (one job, `partitionBy(gbucket)`),
  *   4. publishes manifest v{N} whose bucket map points untouched buckets
  *      at their OLD dirs and touched buckets at the new ones.
  *
  * Cost per commit is O(batch + touched-bucket bytes), not O(index) — the
  * property that lets a 1,500-doc micro-batch land on a 100 TB index
  * without rewriting 100 TB. Production sizes `numBuckets` so a bucket is
  * ~1 GB (100 TB → ~100k buckets); tests use the small default.
  *
  * The manifest file itself is the atomic commit point: it is written to a
  * temp name and renamed into place via Hadoop `FileSystem.rename`
  * (atomic on HDFS; on S3A a single PUT is all-or-nothing), and a rename
  * onto an existing manifest fails — detecting concurrent committers.
  * No mutable `_VERSION` pointer exists (the round-1 design's
  * local-`java.io.File` pointer was not object-store-safe).
  *
  * A delete-only first commit (no schema yet) publishes an empty v0 so
  * `searchable()` returns an empty one-column (`_id`) view rather than
  * throwing — Lucene's commit-on-empty-index semantics.
  */
class ParquetIndexSink(spark: SparkSession, path: String, numBuckets: Int = 16)
    extends IndexSink {
  import ParquetIndexSink._

  /** Pending operations in CALL ORDER — a delete issued after an upsert
    * of the same key must win, exactly like the serial index the
    * reference drives (an earlier draft folded all deletes before all
    * upserts, silently resurrecting add-then-delete keys).
    */
  private sealed trait Op
  private case class Upsert(df: DataFrame) extends Op
  private case class DeleteIds(ids: Seq[String]) extends Op
  private case class DeleteKeys(ids: DataFrame) extends Op

  private var ops: Vector[Op] = Vector.empty
  private var seq = 0L

  private def fs = new HPath(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def manifestDir = new HPath(path, "_manifests")

  /** Latest committed manifest, if any (max N over `_manifests/v{N}.json`). */
  private def readManifest(): Option[Manifest] = {
    val f = fs
    if (!f.exists(manifestDir)) return None
    val versions = f.listStatus(manifestDir).toSeq
      .flatMap(s => s.getPath.getName match {
        case ManifestName(n) => Some(n.toLong)
        case _ => None
      })
    if (versions.isEmpty) None
    else {
      val v = versions.max
      val in = f.open(new HPath(manifestDir, s"v$v.json"))
      val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      Some(Manifest.fromJson(new String(bytes, "UTF-8")))
    }
  }

  /** Publish manifest v{N}: temp write + no-overwrite rename as the
    * commit point. `FileContext.rename` WITHOUT `Options.Rename.OVERWRITE`
    * refuses an existing destination (atomically on HDFS; via an
    * exists-check on filesystems whose primitive rename overwrites, which
    * leaves a millisecond TOCTOU window there — the readback below closes
    * the common interleaving, and per-attempt data dirs mean even a lost
    * manifest race can never corrupt data files, only drop one commit,
    * which at-least-once replay re-delivers). Failures that are NOT an
    * existing destination (unsupported scheme, transient I/O) propagate
    * as themselves — they are not concurrent commits.
    */
  private[sink] def writeManifest(m: Manifest): Unit = {
    val f = fs
    f.mkdirs(manifestDir)
    val tmp = new HPath(manifestDir, s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(m.toJson.getBytes("UTF-8")) finally out.close()
    val dest = new HPath(manifestDir, s"v${m.version}.json")
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      dest.toUri, spark.sparkContext.hadoopConfiguration)
    try fc.rename(f.makeQualified(tmp), f.makeQualified(dest))
    catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException) =>
        f.delete(tmp, false)
        throw new IllegalStateException(
          s"concurrent commit detected: manifest v${m.version} already exists at $path", e)
      case e: Throwable =>
        f.delete(tmp, false)
        throw e
    }
    // readback verify: detect a racer that overwrote between our rename
    // and now (non-atomic-rename filesystems only)
    val in = f.open(dest)
    val back = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    if (!java.util.Arrays.equals(back, m.toJson.getBytes("UTF-8")))
      throw new IllegalStateException(
        s"lost commit race: manifest v${m.version} at $path was replaced by a concurrent committer")
  }

  override def addDocuments(docs: DataFrame): Long = synchronized {
    require(!docs.columns.contains(BucketCol),
      s"'$BucketCol' is a reserved column name in ParquetIndexSink")
    ops :+= Upsert(docs)
    seq += 1; seq
  }
  override def deleteByIds(ids: Seq[String]): Unit = synchronized {
    ops :+= DeleteIds(ids)
  }
  override def deleteByKeys(ids: DataFrame): Unit = synchronized {
    ops :+= DeleteKeys(ids)
  }

  override def commit(): Unit = synchronized {
    if (ops.isEmpty) return
    val prev = readManifest()
    // bucket modulus is fixed at index creation: reopening with a different
    // numBuckets must keep the committed layout readable
    val nb = prev.map(_.numBuckets).getOrElse(numBuckets)
    def bucketOf(id: Column): Column =
      pmod(xxhash64(id.cast("string")), lit(nb.toLong)).cast("int")

    // width-only schema evolution: the committed schema is the union (by
    // name) of the previous schema and every pending upsert's schema —
    // documents written before a column existed read as null (parquet
    // fills absent columns), new documents may omit old columns. A TYPE
    // change for an existing name is refused loudly.
    val schema: Option[StructType] =
      (prev.flatMap(_.schema).toSeq ++ ops.collect { case Upsert(df) => df.schema })
        .reduceOption(ParquetIndexSink.mergeSchemas)
    val version = prev.map(_.version + 1).getOrElse(0L)
    val prevBuckets = prev.map(_.buckets).getOrElse(Map.empty[Int, String])

    schema match {
      case None =>
        // delete-only before any schema is known: publish an empty v0 so a
        // successful commit always yields a searchable (empty) index
        writeManifest(Manifest(version, nb, None, prevBuckets))
        ops = Vector.empty
        return
      case Some(s) =>
        // 1. touched buckets: one distinct-agg over the pending keys
        //    (result is ≤ numBuckets ints — driver-safe at any batch size).
        //    With no committed buckets there is nothing to prune or carry
        //    forward — skip the job entirely (the common first commit).
        val touched: Set[Int] =
          if (prevBuckets.isEmpty) Set.empty
          else {
            val keyFrames = ops.map {
              case Upsert(df) => df.select(col(idField).cast("string").as("_k"))
              case DeleteIds(ids) =>
                import spark.implicits._
                ids.toDF("_k")
              case DeleteKeys(df) =>
                df.select(col(df.columns.head).cast("string").as("_k"))
            }
            keyFrames.reduce(_.unionByName(_))
              .filter(col("_k").isNotNull)
              .select(bucketOf(col("_k")).as("_b")).distinct()
              .collect().map(_.getInt(0)).toSet
          }

        // 2. read ONLY the touched buckets of the committed index
        val baseDirs = touched.toSeq.sorted.flatMap(prevBuckets.get)
          .map(rel => s"$path/$rel")
        val base =
          if (baseDirs.isEmpty)
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          else spark.read.schema(s).parquet(baseDirs: _*)

        // 3. ops in call order — same MERGE semantics as round 1. The
        //    statically-known-empty accumulator (first commit, or all
        //    touched buckets previously vacant) skips the anti-join/union
        //    plan nodes: deletes on nothing stay nothing, and the first
        //    upsert IS the index.
        val (next, _) = ops.foldLeft((base, baseDirs.isEmpty)) {
          case ((acc, isEmpty), Upsert(df)) =>
            // align to the committed (merged) schema: absent columns null
            val aligned = df.select(s.fields.toSeq.map { f =>
              if (df.columns.contains(f.name)) col(f.name)
              else lit(null).cast(f.dataType).as(f.name)
            }: _*)
            // last add per _id wins inside one batch
            val compacted = Changelog.compact(
              aligned.withColumn("_seq", monotonically_increasing_id()),
              idField, Seq(col("_seq"))).drop("_seq")
            if (isEmpty) (compacted, false)
            else (acc.join(compacted.select(idField), Seq(idField), "left_anti")
              .unionByName(compacted), false)
          case ((acc, isEmpty), DeleteIds(ids)) =>
            (if (ids.isEmpty || isEmpty) acc
             else acc.filter(!col(idField).isin(ids: _*)), isEmpty)
          case ((acc, isEmpty), DeleteKeys(ids)) =>
            (if (isEmpty) acc
             else Changelog.deleteByKeySet(acc, idField, ids), isEmpty)
        }

        // 4. one job writes all touched buckets under an immutable new dir.
        //    Shuffle by bucket first: without it, every task writes a file
        //    per bucket it happens to see (tasks × buckets tiny files —
        //    measured 4× slower at sf0.1); with it, each bucket is exactly
        //    one task writing one file (~1 GB at production sizing).
        //    The dir carries a per-attempt suffix so concurrent committers
        //    racing to the same version can never overwrite each other's
        //    data files — the loser's orphan dir is vacuum()ed.
        val commitDir = s"data/c$version-${ParquetIndexSink.attemptId()}"
        next.withColumn(BucketCol, bucketOf(col(idField)))
          .repartition(col(BucketCol))
          .write.mode("overwrite").partitionBy(BucketCol)
          .parquet(s"$path/$commitDir")
        // a touched bucket with zero surviving docs writes no dir → it
        // drops out of the manifest entirely
        val written: Map[Int, String] =
          fs.listStatus(new HPath(s"$path/$commitDir")).toSeq
            .map(_.getPath.getName).collect {
              case n if n.startsWith(s"$BucketCol=") =>
                n.stripPrefix(s"$BucketCol=").toInt -> s"$commitDir/$n"
            }.toMap
        writeManifest(Manifest(version, nb,
          Some(next.schema), (prevBuckets -- touched) ++ written))
        ops = Vector.empty
    }
  }

  override def searchable(): DataFrame = readManifest() match {
    case None =>
      throw new IllegalStateException(s"index at $path has no committed version")
    case Some(m) =>
      val s = m.schema.getOrElse(StructType(Seq(StructField(idField, StringType))))
      if (m.buckets.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      else
        spark.read.schema(s)
          .parquet(m.buckets.toSeq.sortBy(_._1).map(rel => s"$path/${rel._2}"): _*)
  }

  /** Current committed bucket map — exposed for tests asserting that a
    * commit leaves untouched buckets' files physically untouched.
    */
  def committedBuckets: Map[Int, String] =
    readManifest().map(_.buckets).getOrElse(Map.empty)

  /** Offline bucket-count evolution: rewrite the whole index under a new
    * modulus and publish it as the next manifest version. Deliberately
    * O(index) — it is the maintenance job run when buckets outgrow the
    * ~1 GB target (each bucket rewrite is one task, so the job
    * parallelizes across the cluster); steady-state commits stay
    * O(batch). Pending uncommitted ops are refused: rebucket between
    * batches, not inside one.
    */
  def rebucket(newBuckets: Int): Unit = synchronized {
    require(newBuckets > 0, s"bucket count must be positive, got $newBuckets")
    require(ops.isEmpty, "rebucket with pending uncommitted ops; commit first")
    val prev = readManifest().getOrElse(
      throw new IllegalStateException(s"index at $path has no committed version"))
    if (prev.numBuckets == newBuckets) return
    val version = prev.version + 1
    val commitDir = s"data/c$version-${ParquetIndexSink.attemptId()}"
    val written: Map[Int, String] = prev.schema match {
      case None => Map.empty
      case Some(_) =>
        searchable().withColumn(BucketCol,
            pmod(xxhash64(col(idField).cast("string")), lit(newBuckets.toLong)).cast("int"))
          .repartition(col(BucketCol))
          .write.mode("overwrite").partitionBy(BucketCol)
          .parquet(s"$path/$commitDir")
        fs.listStatus(new HPath(s"$path/$commitDir")).toSeq
          .map(_.getPath.getName).collect {
            case n if n.startsWith(s"$BucketCol=") =>
              n.stripPrefix(s"$BucketCol=").toInt -> s"$commitDir/$n"
          }.toMap
    }
    writeManifest(Manifest(version, newBuckets, prev.schema, written))
  }

  /** Delete data dirs no manifest-current bucket references, and all
    * manifests but the latest (time-travel is not part of the contract).
    */
  def vacuum(): Unit = synchronized {
    readManifest().foreach { m =>
      val f = fs
      val live = m.buckets.values.map(rel => new HPath(s"$path/$rel").toUri.getPath).toSet
      val dataDir = new HPath(path, "data")
      if (f.exists(dataDir))
        f.listStatus(dataDir).foreach { c =>
          f.listStatus(c.getPath).foreach { b =>
            if (!live.contains(b.getPath.toUri.getPath)) f.delete(b.getPath, true)
          }
          if (f.listStatus(c.getPath).isEmpty) f.delete(c.getPath, true)
        }
      f.listStatus(manifestDir).foreach { s =>
        if (s.getPath.getName != s"v${m.version}.json") f.delete(s.getPath, false)
      }
    }
  }
}

object ParquetIndexSink {
  /** Partition-dir column for the key-hash bucket. Reserved: must not be a
    * document column (no leading `_` — underscore-prefixed dirs are hidden
    * from Hadoop file listing).
    */
  val BucketCol = "gbucket"

  /** Random suffix for a commit attempt's data dir — two committers racing
    * to the same version write disjoint dirs; the manifest CAS picks the
    * winner and the loser's dir is unreferenced garbage for `vacuum`.
    */
  private[sink] def attemptId(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Union-by-name of two document schemas (width-only evolution): fields
    * keep `a`'s order, `b`'s new fields append; everything is nullable
    * (old documents lack new columns). A type change is a hard error —
    * silent coercion would corrupt the index.
    */
  private[sink] def mergeSchemas(a: StructType, b: StructType): StructType = {
    val byName = a.fields.map(f => f.name -> f).toMap
    b.fields.foreach { f =>
      byName.get(f.name).foreach { prev =>
        require(prev.dataType == f.dataType,
          s"schema evolution cannot change type of '${f.name}': " +
            s"${prev.dataType.simpleString} -> ${f.dataType.simpleString}")
      }
    }
    StructType(
      a.fields.map(_.copy(nullable = true)) ++
        b.fields.filterNot(f => byName.contains(f.name)).map(_.copy(nullable = true)))
  }

  private val ManifestName = """v(\d+)\.json""".r

  /** One committed index version: bucket → relative data dir. */
  private[sink] final case class Manifest(
      version: Long, numBuckets: Int,
      schema: Option[StructType], buckets: Map[Int, String]) {
    def toJson: String = {
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods._
      compact(render(
        ("version" -> version) ~ ("numBuckets" -> numBuckets) ~
          ("schema" -> schema.map(_.json)) ~
          ("buckets" -> buckets.map { case (k, v) => k.toString -> v })))
    }
  }

  private[sink] object Manifest {
    def fromJson(s: String): Manifest = {
      import org.json4s._
      import org.json4s.jackson.JsonMethods._
      implicit val fmts: Formats = DefaultFormats
      val j = parse(s)
      Manifest(
        (j \ "version").extract[Long],
        (j \ "numBuckets").extract[Int],
        (j \ "schema").extractOpt[String]
          .map(DataType.fromJson(_).asInstanceOf[StructType]),
        (j \ "buckets").extract[Map[String, String]]
          .map { case (k, v) => k.toInt -> v })
    }
  }
}
