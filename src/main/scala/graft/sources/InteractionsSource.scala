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
 * materializes one-field rows, never parses what it drops. Filters are
 * NOT pushed — with three fixed columns the line must be split either
 * way, so a filter pushdown would only duplicate Catalyst's own
 * codegen'd filter.
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
    InteractionsSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft-interactions requires a single load(path)")
    new InteractionsTable(path)
  }
}

object InteractionsSource {
  val Schema: StructType = new StructType()
    .add("user", IntegerType)
    .add("item", IntegerType)
    .add("ts", TimestampType)
}

private[sources] class InteractionsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-interactions(`$path`)"
  override def schema(): StructType = InteractionsSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new InteractionsScanBuilder(path)
}

private[sources] class InteractionsScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = InteractionsSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the source's field order; Spark projects afterwards
    required = new StructType(InteractionsSource.Schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new InteractionsScan(path, required)
}

private[sources] case class InteractionFilePartition(file: String) extends InputPartition

private[sources] class InteractionsScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per file, in the reference monitor's (mod-time, name)
    * order. Listing runs on the driver with the session's Hadoop conf. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
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
      .map(st => InteractionFilePartition(st.getPath.toUri.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new InteractionsReaderFactory(required.fieldNames,
      new SerializableHadoopConf(SparkSession.active.sparkContext.hadoopConfiguration))
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
