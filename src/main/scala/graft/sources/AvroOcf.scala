package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.{LogicalType, LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Hadoop `Configuration` is not `java.io.Serializable`, so task closures
  * that need the SESSION conf (s3a credentials, `spark.hadoop.*`
  * overrides — anything set programmatically on the driver) must carry
  * it via Hadoop's own `Writable` wire format. Without this, executors
  * rebuilding `new Configuration()` see only the cluster's static
  * `core-site.xml`: local-fs tests pass while the documented
  * object-store deployment silently authenticates with the wrong (or
  * no) credentials. Same shape as Spark's internal wrapper, which is
  * `private[spark]` and therefore not reachable from here.
  */
private[sources] final class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

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
  * the tiny-tail range, plus a ScalaCheck property over random layouts).
  * This is the public Hadoop `AvroRecordReader` contract; a
  * 1000-executor cluster reads one file at `size / maxSplitBytes`
  * parallelism instead of one task per file (the gzip-JSONL limitation
  * documented at `s_jsonl_gz_scan` does NOT apply here — that is the
  * point of the container format).
  *
  * COLUMN PRUNING at the decoder: [[read]] resolves each file's WRITER
  * schema against the requested StructType task-side and hands Avro a
  * projection reader schema, so schema resolution skips the bytes of
  * unrequested writer fields — projection happens during decode, not
  * after. Requested nullable fields ABSENT from the writer schema
  * resolve to null (the width-only schema-evolution contract the
  * parquet sink documents); an absent non-nullable field fails loudly.
  *
  * LOGICAL TYPES (the reference's Avro surface carries them —
  * `AvroToAddDocumentConverterTest.java:60-84` pins date and timestamp
  * conversion semantics, §1.2 the value mapping): `date` (int, epoch
  * days) ↔ DateType; `timestamp-micros`/`timestamp-millis` (long) ↔
  * TimestampType and `local-timestamp-micros`/`-millis` ↔
  * TimestampNTZType (the writer's unit decides the scale — this sink
  * emits micros, Spark's native precision, and the reader accepts BOTH
  * units plus `fixed`-backed decimals from foreign writers); `decimal` over
  * bytes or fixed ↔ DecimalType, requiring the writer's scale to equal
  * the requested scale and its precision to fit — a narrower request
  * fails loudly rather than rounding.
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
    * Date/Timestamp/Decimal columns carry the standard Avro logical
    * types (timestamps as `timestamp-micros`, Spark's native precision).
    */
  def avroSchema(st: StructType, recordName: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), baseSchema(f.dataType))),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      else new Schema.Field(f.name, baseSchema(f.dataType), null)
    }
    Schema.createRecord(recordName, null, "graft", false,
      java.util.List.of(fields: _*))
  }

  private def baseSchema(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case StringType => Schema.create(Schema.Type.STRING)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case other => throw new IllegalArgumentException(
      s"AvroOcf supports primitive columns, got ${other.simpleString} " +
        "(flatten structs/arrays upstream — the P1 flattener exists " +
        "for exactly this)")
  }

  /** Spark external value → Avro base value for one column. Null is
    * handled by the caller; a value of an unexpected runtime class fails
    * loudly naming the column type.
    */
  private def encoderFor(dt: DataType): Any => Any = dt match {
    case BinaryType =>
      v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case DateType => {
      case d: java.sql.Date => Int.box(d.toLocalDate.toEpochDay.toInt)
      case ld: java.time.LocalDate => Int.box(ld.toEpochDay.toInt)
      case other => throw new IllegalArgumentException(
        s"AvroOcf: DateType column holds ${other.getClass.getName}")
    }
    case TimestampType => {
      case t: java.sql.Timestamp => Long.box(instantMicros(t.toInstant))
      case i: java.time.Instant => Long.box(instantMicros(i))
      case other => throw new IllegalArgumentException(
        s"AvroOcf: TimestampType column holds ${other.getClass.getName}")
    }
    case TimestampNTZType => {
      case ldt: java.time.LocalDateTime =>
        Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000)
      case other => throw new IllegalArgumentException(
        s"AvroOcf: TimestampNTZType column holds ${other.getClass.getName}")
    }
    case d: DecimalType => {
      // setScale with no rounding mode throws on precision loss — a
      // Spark decimal(p,s) value always carries exactly scale s, so a
      // throw here means a contract violation, not data.
      case bd: java.math.BigDecimal =>
        ByteBuffer.wrap(bd.setScale(d.scale).unscaledValue().toByteArray)
      case bd: scala.math.BigDecimal =>
        ByteBuffer.wrap(
          bd.underlying().setScale(d.scale).unscaledValue().toByteArray)
      case other => throw new IllegalArgumentException(
        s"AvroOcf: DecimalType column holds ${other.getClass.getName}")
    }
    case _ => identity
  }

  private def instantMicros(i: java.time.Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000

  private def microsToTimestamp(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  private def microsToLocalDateTime(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L), (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  /** Write `df` as one OCF file per non-empty partition under `dir`
    * (`part-<pid>.avro`), returning the written paths. Distributed: each
    * task streams its partition through a `DataFileWriter` directly into
    * the target filesystem (deflate-codec-free: the gate compares decode
    * fidelity, and codec choice is orthogonal to the container contract).
    * `syncIntervalBytes` bounds block size — smaller blocks = finer
    * split granularity at read (and more marker overhead). Tasks carry
    * the SESSION Hadoop conf (see [[SerializableHadoopConf]]) so
    * driver-set s3a credentials reach the executor-side filesystem.
    *
    * `codec` is any OCF block codec Avro's `CodecFactory.fromString`
    * resolves (`"null"`, `"deflate"`, `"snappy"`, `"zstandard"` — the
    * latter two ride the snappy-java/zstd-jni jars Spark ships).
    * Compression is PER BLOCK, between sync markers, so the split-read
    * contract is untouched: a real-world deflate/zstd OCF splits
    * exactly like an uncompressed one (unlike gzip-JSONL — that is the
    * container's point). The codec name is validated on the DRIVER so a
    * typo fails before any task launches; readers auto-detect the codec
    * from the file header.
    */
  def write(df: DataFrame, dir: String,
      syncIntervalBytes: Int = 1 << 16, codec: String = "null"): Seq[String] = {
    try org.apache.avro.file.CodecFactory.fromString(codec)
    catch {
      case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
        s"AvroOcf: unknown codec '$codec' " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage})", e)
    }
    val st = df.schema
    val json = avroSchema(st).toString // Schema itself is not serializable
    val n = st.fields.length
    val encs: Array[Any => Any] = st.fields.map(f => encoderFor(f.dataType))
    val conf = new SerializableHadoopConf(
      df.sparkSession.sessionState.newHadoopConf())
    df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(json)
        val p = new Path(f"$dir/part-$pid%05d.avro")
        val fs = p.getFileSystem(conf.value)
        val out = fs.create(p, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setSyncInterval(syncIntervalBytes)
        w.setCodec(org.apache.avro.file.CodecFactory.fromString(codec))
        w.create(schema, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < n) {
              val v = row.get(i)
              rec.put(i, if (v == null) null else encs(i)(v))
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
    val conf = new SerializableHadoopConf(spark.sessionState.newHadoopConf())
    val root = new Path(dir)
    val fs = root.getFileSystem(conf.value)
    val files = fs.listStatus(root).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      (0L until len by maxSplitBytes).map(start =>
        (f, start, math.min(start + maxSplitBytes, len)))
    }
    val rdd = spark.sparkContext
      .parallelize(splits, math.max(splits.size, 1))
      .flatMap { case (file, start, end) =>
        readRange(file, start, end, schema, conf.value)
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Projection reader schema + per-column decoders for one file: each
    * requested column PRESENT in the writer schema copies the writer's
    * field schema verbatim (identity resolution — the writer's logical
    * type, union shape, and decimal backing decide the wire value, and
    * the decoder owns the conversion to Spark's external type), while an
    * absent nullable column gets `union(null, T)` with a null default.
    * The record keeps the writer's full name so Avro's resolution
    * accepts it.
    */
  private def resolve(st: StructType,
      writer: Schema): (Schema, Array[Any => Any]) = {
    val decs = new Array[Any => Any](st.fields.length)
    val fields = st.fields.zipWithIndex.map { case (f, i) =>
      val wf = writer.getField(f.name)
      if (wf == null) {
        if (!f.nullable) throw new IllegalArgumentException(
          s"AvroOcf: non-nullable column '${f.name}' is absent from " +
            s"writer schema ${writer.getFullName} — width-only evolution " +
            "covers nullable columns only")
        decs(i) = identity // never invoked: resolution yields null
        new Schema.Field(f.name,
          Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), baseSchema(f.dataType))),
          null, Schema.Field.NULL_DEFAULT_VALUE)
      } else {
        val wbase = wf.schema().getType match {
          case Schema.Type.UNION =>
            val nonNull = wf.schema().getTypes.stream()
              .filter(s => s.getType != Schema.Type.NULL).toList
            if (nonNull.size != 1) throw new IllegalArgumentException(
              s"AvroOcf: column '${f.name}' has a non-nullable union " +
                s"writer schema ${wf.schema()} — unsupported")
            nonNull.get(0)
          case _ => wf.schema()
        }
        decs(i) = decoderFor(f, wbase)
        new Schema.Field(f.name, wf.schema(), null)
      }
    }
    val rs = Schema.createRecord(writer.getName, null, writer.getNamespace,
      false, java.util.List.of(fields: _*))
    (rs, decs)
  }

  /** Avro base value (as decoded under the WRITER's field schema) →
    * Spark external value for one column; throws loudly on a
    * Spark-type/writer-schema mismatch. Null is handled by the caller.
    */
  private def decoderFor(field: StructField, w: Schema): Any => Any = {
    import Schema.Type._
    val lt: LogicalType = w.getLogicalType
    def bytesOf(v: Any): Array[Byte] = v match {
      case bb: ByteBuffer =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      case gf: GenericFixed => gf.bytes()
      case other => throw new IllegalArgumentException(
        s"AvroOcf: column '${field.name}' decoded ${other.getClass.getName}")
    }
    (field.dataType, w.getType) match {
      case (LongType, LONG) if lt == null => identity
      case (IntegerType, INT) if lt == null => identity
      case (StringType, STRING) => v => v.toString // Utf8 or String
      case (DoubleType, DOUBLE) => identity
      case (FloatType, FLOAT) => identity
      case (BooleanType, BOOLEAN) => identity
      case (BinaryType, BYTES) if lt == null => bytesOf
      case (DateType, INT) if lt.isInstanceOf[LogicalTypes.Date] =>
        v => java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case (TimestampType, LONG)
          if lt.isInstanceOf[LogicalTypes.TimestampMillis] =>
        v => microsToTimestamp(Math.multiplyExact(v.asInstanceOf[Long], 1000L))
      case (TimestampType, LONG)
          if lt.isInstanceOf[LogicalTypes.TimestampMicros] =>
        v => microsToTimestamp(v.asInstanceOf[Long])
      case (TimestampNTZType, LONG)
          if lt.isInstanceOf[LogicalTypes.LocalTimestampMillis] =>
        v => microsToLocalDateTime(
          Math.multiplyExact(v.asInstanceOf[Long], 1000L))
      case (TimestampNTZType, LONG)
          if lt.isInstanceOf[LogicalTypes.LocalTimestampMicros] =>
        v => microsToLocalDateTime(v.asInstanceOf[Long])
      case (dt: DecimalType, BYTES | FIXED)
          if lt.isInstanceOf[LogicalTypes.Decimal] =>
        val d = lt.asInstanceOf[LogicalTypes.Decimal]
        if (d.getScale != dt.scale || d.getPrecision > dt.precision)
          throw new IllegalArgumentException(
            s"AvroOcf: column '${field.name}' wants " +
              s"decimal(${dt.precision},${dt.scale}) but writer has " +
              s"decimal(${d.getPrecision},${d.getScale}) — exact scale " +
              "match and a wide-enough precision are required (no " +
              "silent rounding)")
        v => new java.math.BigDecimal(
          new java.math.BigInteger(bytesOf(v)), d.getScale)
      case _ => throw new IllegalArgumentException(
        s"AvroOcf: column '${field.name}' wants " +
          s"${field.dataType.simpleString} but writer has $w")
    }
  }

  /** One split's records as Rows — the task body of [[read]], factored
    * so the spec can drive adversarial split points directly. Resolves
    * this FILE's writer schema against the requested Spark schema (see
    * [[resolve]]) before seeking, so heterogeneous writers — different
    * column order, timestamp unit, decimal backing, or width — each
    * decode under their own contract.
    */
  private[sources] def readRange(file: String, start: Long, end: Long,
      schema: StructType, conf: Configuration): Iterator[Row] = {
    val nFields = schema.fields.length
    val (reader, decoders) =
      try {
        val datumReader = new GenericDatumReader[GenericRecord]()
        val in = new FsInput(new Path(file), conf)
        val r = new DataFileReader[GenericRecord](in, datumReader)
        val (readerSchema, decs) = resolve(schema, r.getSchema)
        datumReader.setExpected(readerSchema)
        r.sync(start)
        (r, decs)
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
            case v => decoders(i)(v)
          }
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }
}
