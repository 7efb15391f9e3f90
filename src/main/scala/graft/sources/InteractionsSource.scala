package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{IntegerType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * DataSource V2 implementation of the reference's interactions text
 * format: `user,item,ts-millis` lines, schema (user INT, item INT,
 * ts TIMESTAMP).
 *
 * The reference treats this input as an UNSPLITTABLE format read in
 * file-modification-time order (`ContinuousFileMonitoringFunction
 * .java:266-294` — splits forwarded in mod-time order, files never
 * split; line parse per `FlinkCooccurrences.java:207-219`). This source
 * encodes both contracts at the PLANNING layer, where a generic text
 * scan cannot:
 *  - one InputPartition per FILE — Spark will never split a file, so
 *    within-file line order survives into each partition (the property
 *    the streaming side gets from `maxFilesPerTrigger=1`);
 *  - partitions are planned in (modification-time, name) order, the
 *    monitor's deterministic order.
 *
 * Column pruning is pushed into the reader
 * (SupportsPushDownRequiredColumns): a `groupBy(user).count()` plan
 * materializes one-field rows, never parses what it drops. STREAMING
 * reads can't benefit from that path — Spark's micro-batch planner does
 * not run V2 scan pushdown for streaming relations — so the format also
 * accepts a `columns` option (comma-separated subset) that shrinks the
 * TABLE schema itself; a `readStream.option("columns", "item")` scan
 * then never parses the dropped fields. Filters are NOT pushed — with
 * three fixed columns the line must be split either way, so a filter
 * pushdown would only duplicate Catalyst's own codegen'd filter.
 *
 * Scale posture: parallelism = file count (the format's inherent
 * limit — the reference has the same property); a 100 TB corpus in this
 * format is many files, not big ones. Readers stream lines through a
 * 64 KiB buffer — memory is O(line), never O(file).
 *
 * Usage: `spark.read.format("graft-interactions").load(dir)` (the short
 * name is registered via META-INF/services).
 */
class InteractionsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-interactions"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InteractionsSource.schemaFor(options.get("columns"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // option names are case-insensitive everywhere else in the DSv2 API
    // (inferSchema receives a CaseInsensitiveStringMap); match that here
    // so .option("Columns", ...) infers and validates the SAME schema
    val expected = InteractionsSource.schemaFor(
      new CaseInsensitiveStringMap(properties).get("columns"))
    // the format's schema is FIXED (modulo the `columns` projection
    // option) — a caller-supplied divergent schema would otherwise be
    // silently ignored and produce confusing downstream analysis errors
    require(schema == null || schema == expected,
      s"graft-interactions has a fixed schema ${expected.simpleString}; " +
        s"got ${schema.simpleString} — drop the .schema(...) call")
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-interactions requires a single load(path)")
    new InteractionsTable(path, expected)
  }
}

object InteractionsSource {
  val Schema: StructType = new StructType()
    .add("user", IntegerType)
    .add("item", IntegerType)
    .add("ts", TimestampType)

  /** Table schema for an optional `columns` projection option
    * (comma-separated subset in any order; served in source field
    * order). The option exists because Spark's micro-batch planner does
    * NOT run V2 scan pushdown for streaming relations — a batch read
    * prunes through SupportsPushDownRequiredColumns automatically, but a
    * `readStream` scan is planned with the full table schema, so the
    * only way a streaming reader can skip parsing dropped fields is to
    * shrink the TABLE schema itself. Unknown names fail loudly. */
  private[sources] def schemaFor(columnsOpt: String): StructType = {
    if (columnsOpt == null || columnsOpt.trim.isEmpty) return Schema
    val want = columnsOpt.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = want.filterNot(Schema.fieldNames.contains)
    require(unknown.isEmpty,
      s"graft-interactions: unknown columns ${unknown.mkString(", ")} " +
        s"(valid: ${Schema.fieldNames.mkString(", ")})")
    require(want.nonEmpty, "graft-interactions: columns option is empty")
    new StructType(Schema.fields.filter(f => want.contains(f.name)))
  }

  /** Data files under `path` (or `path` itself) in the reference
    * monitor's deterministic (modification-time, name) order, hidden
    * files skipped. Listing runs on the driver with the CAPTURED session
    * Hadoop conf — never resolved via SparkSession.active inside a
    * planning callback, which in a multi-session JVM can pick up the
    * wrong session's fs.* settings. */
  private[sources] def listDataFiles(conf: Configuration, path: String): Array[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files: Array[FileStatus] =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p)
      else Array(fs.getFileStatus(p))
    files
      .filter(st => st.isFile && {
        val n = st.getPath.getName
        !n.startsWith("_") && !n.startsWith(".")
      })
      .sortBy(st => (st.getModificationTime, st.getPath.getName))
  }
}

private[sources] class InteractionsTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-interactions(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // Streaming admission width: how many pending files one trigger may
    // ingest, in (mod-time, name) order. 1 = the reference monitor's
    // contract (strict per-file triggers) and the default; callers whose
    // corpus windows align across files can raise it to amortize
    // per-trigger planning without changing the drained result (the
    // pipeline aggregates are trigger-split independent).
    val maxFiles = options.getInt("maxFilesPerTrigger", 1)
    require(maxFiles > 0,
      s"graft-interactions: maxFilesPerTrigger must be positive, got $maxFiles")
    // capture the calling session's Hadoop conf HERE (driver, planning
    // thread) — execution-time callbacks must not depend on which
    // session is "active" on the thread that happens to invoke them
    new InteractionsScanBuilder(path, tableSchema,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration),
      maxFiles)
  }
}

private[sources] class InteractionsScanBuilder(path: String,
    tableSchema: StructType, conf: SerializableHadoopConf,
    maxFilesPerTrigger: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order; Spark projects afterwards
    required = new StructType(tableSchema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new InteractionsScan(path, required, conf, maxFilesPerTrigger)
}

private[sources] case class InteractionFilePartition(file: String) extends InputPartition

private[sources] class InteractionsScan(path: String, required: StructType,
    conf: SerializableHadoopConf, maxFilesPerTrigger: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per file, in the reference monitor's (mod-time, name)
    * order. */
  override def planInputPartitions(): Array[InputPartition] =
    InteractionsSource.listDataFiles(conf.value, path)
      .map(st => InteractionFilePartition(st.getPath.toUri.toString): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new InteractionsReaderFactory(required.fieldNames, conf)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new InteractionsMicroBatchStream(path, required.fieldNames, conf,
      maxFilesPerTrigger)
}

/**
 * Streaming offset for the interactions monitor: the (modification-time,
 * name) watermark of the LAST file fully ingested. Files are immutable
 * and planned in (mod-time, name) order, so a single watermark pair —
 * not a seen-file set — identifies exactly which prefix of the corpus a
 * restarted query has consumed; files that appear later with a key at or
 * below the watermark are ignored, the reference monitor's own contract
 * (`ContinuousFileMonitoringFunction.java:219-294` tracks a global
 * modification-time watermark the same way).
 */
private[sources] case class InteractionsOffset(modTime: Long, name: String) extends Offset {
  override def json(): String = {
    val esc = name.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"modTime":$modTime,"name":"$esc"}"""
  }
}

private[sources] object InteractionsOffset {
  val Start: InteractionsOffset = InteractionsOffset(Long.MinValue, "")

  private val Shape = """\{"modTime":(-?\d+),"name":"(.*)"\}""".r

  def fromJson(json: String): InteractionsOffset = json match {
    case Shape(mt, esc) =>
      val sb = new StringBuilder
      var i = 0
      while (i < esc.length) {
        if (esc.charAt(i) == '\\' && i + 1 < esc.length) { sb.append(esc.charAt(i + 1)); i += 2 }
        else { sb.append(esc.charAt(i)); i += 1 }
      }
      InteractionsOffset(mt.toLong, sb.toString)
    case _ => throw new IllegalArgumentException(s"bad interactions offset: $json")
  }
}

/**
 * Micro-batch planning of the reference's PROCESS_ONCE file monitor
 * (`ContinuousFileMonitoringFunction.java:219-294`): files are admitted
 * in (mod-time, name) order, ONE file per trigger by default
 * (`ReadLimit.maxFiles(1)` — the planning-layer form of the
 * `maxFilesPerTrigger=1` staging the generic file source needs), each
 * file unsplittable so per-file line order survives into its single
 * partition. Offsets are (mod-time, name) watermarks, so a restart from
 * checkpoint resumes after the last fully-ingested file without
 * re-reading or skipping anything.
 */
private[sources] class InteractionsMicroBatchStream(path: String,
    fieldNames: Array[String], conf: SerializableHadoopConf,
    maxFilesPerTrigger: Int = 1)
    extends MicroBatchStream with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private def key(st: FileStatus): (Long, String) =
    (st.getModificationTime, st.getPath.getName)

  // PROCESS_ONCE snapshot for Trigger.AvailableNow: implemented HERE
  // (not via Spark's AvailableNowDataStreamWrapper, whose
  // latestOffset(start, limit) discards the read limit and would collapse
  // the run into one giant batch) so per-trigger file admission survives
  // available-now runs.
  @volatile private var availableNowCap: Option[(Long, String)] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val all = InteractionsSource.listDataFiles(conf.value, path)
    availableNowCap = Some(
      if (all.isEmpty) (Long.MinValue, "") else key(all.last))
  }

  private def after(off: InteractionsOffset): Array[FileStatus] = {
    val listed = InteractionsSource.listDataFiles(conf.value, path)
      .filter(st => Ordering[(Long, String)].gt(key(st), (off.modTime, off.name)))
    availableNowCap match {
      case Some(cap) => listed.filter(st => Ordering[(Long, String)].lteq(key(st), cap))
      case None => listed
    }
  }

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxFiles(maxFilesPerTrigger)

  override def initialOffset(): Offset = InteractionsOffset.Start

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val pending = after(start.asInstanceOf[InteractionsOffset])
    val admitted = limit match {
      case mf: ReadMaxFiles => pending.take(mf.maxFiles())
      case _ => pending // allAvailable (and any row/byte limit: files are the unit here)
    }
    if (admitted.isEmpty) start
    else {
      val last = admitted.last
      InteractionsOffset(last.getModificationTime, last.getPath.getName)
    }
  }

  override def reportLatestOffset(): Offset = {
    val all = InteractionsSource.listDataFiles(conf.value, path)
    if (all.isEmpty) InteractionsOffset.Start
    else InteractionsOffset(all.last.getModificationTime, all.last.getPath.getName)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val endKey = { val e = end.asInstanceOf[InteractionsOffset]; (e.modTime, e.name) }
    after(start.asInstanceOf[InteractionsOffset])
      .filter(st => Ordering[(Long, String)].lteq(key(st), endKey))
      .map(st => InteractionFilePartition(st.getPath.toUri.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new InteractionsReaderFactory(fieldNames, conf)

  override def deserializeOffset(json: String): Offset = InteractionsOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // files are immutable; nothing to release
  override def stop(): Unit = ()
}

/** Java-serializable carrier for the DRIVER's Hadoop configuration, so
  * executors open files with the session's fs.* settings and pay the
  * XML-resource parse once per deserialized factory — not once per file
  * (Spark's own SerializableConfiguration is private[spark]). */
private[sources] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
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

private[sources] class InteractionsReaderFactory(fieldNames: Array[String],
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new InteractionsReader(
      partition.asInstanceOf[InteractionFilePartition].file, fieldNames, conf.value)
}

/** Streams one file's lines in order; parses only the required fields. */
private[sources] class InteractionsReader(file: String, fieldNames: Array[String],
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val needUser = fieldNames.contains("user")
  private val needItem = fieldNames.contains("item")
  private val needTs = fieldNames.contains("ts")

  private val path = new Path(java.net.URI.create(file))
  private val in = path.getFileSystem(conf).open(path)
  private val reader = new BufferedReader(
    new InputStreamReader(in, StandardCharsets.UTF_8), 64 * 1024)
  private var line: String = _

  override def next(): Boolean = {
    line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val c1 = line.indexOf(',')
    val c2 = line.indexOf(',', c1 + 1)
    require(c1 > 0 && c2 > c1,
      s"malformed interaction line (want user,item,ts-millis): '$line'")
    val values = new Array[Any](fieldNames.length)
    var i = 0
    if (needUser) { values(i) = line.substring(0, c1).trim.toInt; i += 1 }
    if (needItem) { values(i) = line.substring(c1 + 1, c2).trim.toInt; i += 1 }
    if (needTs) { // CSV carries epoch millis; TimestampType wants micros
      values(i) = line.substring(c2 + 1).trim.toLong * 1000L
    }
    new GenericInternalRow(values)
  }

  override def close(): Unit = reader.close()
}
