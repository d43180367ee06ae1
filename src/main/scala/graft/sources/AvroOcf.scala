package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink over the avro-core jars Spark
  * ships (`/opt/spark/jars/avro-1.12.1.jar`) — the `spark-avro`
  * DataSource MODULE is not deployed in this environment, but the
  * reference's ecosystem stores Avro (its Kafka payloads are Avro,
  * `AvroToAddDocumentConverter.java`; at-rest drops of the same records
  * are OCF), so the scan family carries the format with its own
  * task-side reader, the [[CsvSource]]/[[JsonlSource]] convention.
  *
  * SCALE DESIGN — real split reading, not file-granular: OCF interleaves
  * a 16-byte sync marker after the header and after every block, so a
  * byte range [start, end) of a multi-GB file is independently readable:
  * `DataFileReader.sync(start)` scans to the first marker past `start`
  * and records are consumed while `!pastSync(end)` — each block belongs
  * to exactly the range containing its starting marker, so ranges
  * partition the file with no duplication and no loss (spec-pinned
  * across adversarial split points, including splits cutting blocks and
  * the tiny-tail range). This is the public Hadoop
  * `AvroRecordReader` contract; a 1000-executor cluster reads one file
  * at `size / maxSplitBytes` parallelism instead of one task per file
  * (the gzip-JSONL limitation documented at `s_jsonl_gz_scan` does NOT
  * apply here — that is the point of the container format).
  *
  * COLUMN PRUNING at the decoder: [[read]] builds an Avro READER schema
  * from the requested StructType and lets Avro's schema resolution skip
  * the bytes of unrequested writer fields — projection happens during
  * decode, not after. Requested nullable fields ABSENT from the writer
  * schema resolve to null (the width-only schema-evolution contract the
  * parquet sink documents); an absent non-nullable field fails loudly.
  *
  * Failure posture: a torn/truncated/corrupt file fails the task LOUDLY
  * naming the file and range — a binary container with per-block sync
  * markers is recoverable storage, not a poison-pill stream, so the
  * CSV/JSONL DLQ contract (malformed RECORDS ride along) does not apply;
  * short corpora with a bad file must stop the job, not silently shrink.
  */
object AvroOcf {

  /** Avro twin of a Spark StructType: nullable fields become
    * `union(null, T)` with `"default": null` (so readers resolve them to
    * null when a writer predates the column — width-only evolution).
    */
  def avroSchema(st: StructType, recordName: String = "row"): Schema = {
    def base(dt: DataType): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case StringType => Schema.create(Schema.Type.STRING)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"AvroOcf supports primitive columns, got ${other.simpleString} " +
          "(flatten structs/arrays upstream — the P1 flattener exists " +
          "for exactly this)")
    }
    val fields = st.fields.map { f =>
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), base(f.dataType))),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, base(f.dataType), null)
    }
    Schema.createRecord(recordName, null, "graft", false,
      java.util.List.of(fields: _*))
  }

  /** Write `df` as one OCF file per non-empty partition under `dir`
    * (`part-<pid>.avro`), returning the written paths. Distributed: each
    * task streams its partition through a `DataFileWriter` directly into
    * the target filesystem (deflate-codec-free: the gate compares decode
    * fidelity, and codec choice is orthogonal to the container contract).
    * `syncIntervalBytes` bounds block size — smaller blocks = finer
    * split granularity at read (and more marker overhead).
    */
  def write(df: DataFrame, dir: String,
      syncIntervalBytes: Int = 1 << 16): Seq[String] = {
    val st = df.schema
    val json = avroSchema(st).toString // Schema itself is not serializable
    val n = st.fields.length
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(json)
        val p = new Path(f"$dir/part-$pid%05d.avro")
        val fs = p.getFileSystem(new Configuration())
        val out = fs.create(p, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setSyncInterval(syncIntervalBytes)
        w.create(schema, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < n) {
              val v = row.get(i) match {
                case null => null
                case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
                case x => x
              }
              rec.put(i, v)
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // also closes the stream
        Iterator.single(p.toString)
      }
    }.collect().toSeq.sorted
  }

  /** Read every `.avro` file under `dir` into `schema`, splitting each
    * file into byte ranges of at most `maxSplitBytes` (see the class doc
    * for why ranges partition the record stream exactly).
    */
  def read(spark: SparkSession, dir: String, schema: StructType,
      maxSplitBytes: Long = 32L * 1024 * 1024): DataFrame = {
    require(maxSplitBytes >= 1, s"maxSplitBytes must be >= 1")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      (0L until len by maxSplitBytes).map(start =>
        (f, start, math.min(start + maxSplitBytes, len)))
    }
    val readerJson = avroSchema(schema).toString
    val n = schema.fields.length
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(splits.size, 1))
      .flatMap { case (file, start, end) =>
        readRange(file, start, end, readerJson, n)
      }
    spark.createDataFrame(rdd, schema)
  }

  /** One split's records as Rows — the task body of [[read]], factored
    * so the spec can drive adversarial split points directly.
    */
  private[sources] def readRange(file: String, start: Long, end: Long,
      readerJson: String, nFields: Int): Iterator[Row] = {
    val readerSchema = new Schema.Parser().parse(readerJson)
    val reader =
      try {
        val in = new FsInput(new Path(file), new Configuration())
        val r = new DataFileReader[GenericRecord](in,
          new GenericDatumReader[GenericRecord](null, readerSchema))
        r.sync(start)
        r
      } catch {
        case scala.util.control.NonFatal(e) => throw new java.io.IOException(
          s"AvroOcf: cannot open $file [$start,$end): " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}", e)
      }
    new Iterator[Row] {
      private var closed = false
      private var reuse: GenericRecord = null
      def hasNext: Boolean = {
        if (closed) false
        else {
          val h = try !reader.pastSync(end) && reader.hasNext
          catch {
            case scala.util.control.NonFatal(e) =>
              reader.close(); closed = true
              throw new java.io.IOException(
                s"AvroOcf: corrupt container $file [$start,$end): " +
                  s"${e.getClass.getSimpleName}: ${e.getMessage}", e)
          }
          if (!h && !closed) { reader.close(); closed = true }
          h
        }
      }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val rec = try { reuse = reader.next(reuse); reuse }
        catch {
          case scala.util.control.NonFatal(e) =>
            reader.close(); closed = true
            throw new java.io.IOException(
              s"AvroOcf: corrupt block in $file [$start,$end): " +
                s"${e.getClass.getSimpleName}: ${e.getMessage}", e)
        }
        val vals = new Array[Any](nFields)
        var i = 0
        while (i < nFields) {
          vals(i) = rec.get(i) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => u.toString
            case bb: java.nio.ByteBuffer =>
              val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
            case x => x
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }
}
