package graft.sources

import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.{StructField, StructType, StringType, LongType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 front door for ER7 message files — the reference's A1 HTTP
  * ingest re-expressed as a first-class Spark batch source:
  * `spark.read.format("er7").load(dir)` yields one row per MESSAGE (files
  * may hold several messages separated by blank lines), schema
  * `(source STRING, msg STRING, n_bytes LONG)`.
  *
  * Where `Pipeline.readMessages` composes built-ins (text scan + explode),
  * this source demonstrates the V2 contract the engine's other scans get
  * from the parquet reader for free:
  *  - **column pruning** (SupportsPushDownRequiredColumns): ask for only
  *    `source` and the reader never materializes message bodies;
  *  - **predicate-driven file skipping** (SupportsPushDownFilters):
  *    EqualTo/In filters on `source` prune whole files from
  *    planInputPartitions — the moral equivalent of partition pruning, at
  *    100 TB the difference between listing and reading;
  *  - **one partition per file**: split work rides Spark's scheduler, no
  *    driver-side reading.
  *
  * Registered as short name `er7` via DataSourceRegister (META-INF
  * services). Message splitting must agree with `Pipeline.readMessages` —
  * PipelineSpec asserts row-set equality between the two paths.
  */
class Er7DataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "er7"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Er7Source.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new Er7Table(Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("er7 source requires a path")))
}

object Er7Source {
  val schema: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("msg", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** The canonical file→messages split (same semantics as the batch/stream
    * readers): blank-line separated, trailing whitespace stripped. */
  def splitMessages(fileText: String): Seq[String] =
    fileText.split("(\\r?\\n)\\s*(\\r?\\n)+").toSeq
      .map(_.replaceAll("\\s+$", ""))
      .filter(_.nonEmpty)

  def listFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    val fs = if (d.isDirectory) d.listFiles().toSeq.filter(_.getName.endsWith(".txt"))
             else Seq(d)
    fs.map(_.getAbsolutePath).sorted
  }

  def stem(path: String): String = {
    val n = path.substring(path.lastIndexOf('/') + 1)
    if (n.endsWith(".txt")) n.dropRight(4) else n
  }
}

class Er7Table(path: String) extends Table with SupportsRead {
  override def name(): String = s"er7:$path"
  override def schema(): StructType = Er7Source.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Er7ScanBuilder(path)
}

class Er7ScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = Er7Source.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept only the file-prunable shapes (EqualTo/In on `source`); every
    * other filter is returned for Spark to evaluate post-scan. The pushed
    * ones are also returned as residual-free (we prune exactly). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, rest) = filters.partition {
      case EqualTo("source", _: String) => true
      case In("source", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = ours
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val files = Er7Source.listFiles(path).filter { f =>
      val s = Er7Source.stem(f)
      pushed.forall {
        case EqualTo("source", v: String) => s == v
        case In("source", vs) => vs.contains(s)
        case _ => true
      }
    }
    new Er7Scan(files, required, path)
  }
}

class Er7Scan(files: Seq[String], required: StructType, path: String = "")
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"Er7Scan files=${files.length} columns=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => Er7InputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new Er7ReaderFactory(required.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new Er7MicroBatchStream(path, required.fieldNames)
}

/** Streaming form of the front door — the reference's A20 storage-event
  * flow (new object lands → event → processing) as a custom V2
  * MicroBatchStream: each `latestOffset` call lists the inbox and extends a
  * monotone file log with unseen files (sorted listing order); an offset is
  * simply the log length, so a micro-batch is the log slice
  * `(start, end]` and replaying any committed range re-reads exactly the
  * same files — deterministic offsets, idempotent with the engine's
  * deterministic sha-256 message ids downstream. Files are assumed
  * immutable-once-arrived and never deleted (the lake inbox contract);
  * a production impl would persist the log per checkpoint like Spark's
  * own file source does. */
class Er7MicroBatchStream(path: String, columns: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset}

  private val discovered = scala.collection.mutable.ArrayBuffer.empty[String]
  private val seen = scala.collection.mutable.HashSet.empty[String]

  private def refresh(): Unit = synchronized {
    Er7Source.listFiles(path).foreach { f =>
      if (seen.add(f)) discovered += f
    }
  }

  override def latestOffset(): SOffset = { refresh(); Er7Offset(discovered.length) }
  override def initialOffset(): SOffset = Er7Offset(0)
  override def deserializeOffset(json: String): SOffset = Er7Offset(json.toLong)
  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] =
    synchronized {
      val (s, e) = (start.asInstanceOf[Er7Offset].n, end.asInstanceOf[Er7Offset].n)
      if (discovered.length < e) refresh() // restart: rebuild the log first
      discovered.slice(s.toInt, e.toInt)
        .map(f => Er7InputPartition(f): InputPartition).toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new Er7ReaderFactory(columns)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
}

case class Er7Offset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

case class Er7InputPartition(file: String) extends InputPartition

class Er7ReaderFactory(columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[Er7InputPartition].file
    new PartitionReader[InternalRow] {
      private val source = Er7Source.stem(file)
      // the file must be read either way (row count = message count), but
      // pruned rows carry only the requested columns — a source-only
      // projection never copies message bodies into row storage
      private val messages: Seq[String] =
        Er7Source.splitMessages(new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)), "UTF-8"))
      private var i = -1
      override def next(): Boolean = { i += 1; i < messages.length }
      override def get(): InternalRow = {
        val m = messages(i)
        InternalRow.fromSeq(columns.toSeq.map {
          case "source" => UTF8String.fromString(source)
          case "msg" => UTF8String.fromString(m)
          case "n_bytes" => m.getBytes("UTF-8").length.toLong
        })
      }
      override def close(): Unit = ()
    }
  }
}
