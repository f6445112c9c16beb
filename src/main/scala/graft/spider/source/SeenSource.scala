package graft.spider.source

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Java-serializable Hadoop `Configuration` carrier: the session's conf is
  * captured once on the driver (at scan-build time) and shipped to the
  * partition readers, so the DSv2 seen reader honors session filesystem
  * settings exactly like `CrawlCatalog.writeTable` (which uses
  * `spark.sessionState.newHadoopConf()`) instead of a bare default conf. */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
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

/** DataSource-v2 reader over the IceLite bucketed `seen` layout (VERDICT r2
  * task #3; SURVEY.md §2.1 S5/§4.4).
  *
  * The committed seen history lives as per-round (plus periodically
  * compacted) parquet file sets directory-partitioned by
  * `seen_bucket = pmod(url_hash, N)`. A plain `spark.read.parquet` union
  * cannot tell Catalyst about that clustering, so the classic (non-flipped)
  * membership join pays a full-history Exchange. This table reports the
  * layout via `SupportsReportPartitioning` → `KeyGroupedPartitioning` on
  * `seen_bucket` with one input partition per bucket (each implementing
  * `HasPartitionKey`), the v2 analog of an Iceberg bucket-partitioned table.
  * With `spark.sql.sources.v2.bucketing.enabled` +
  * `...bucketing.shuffle.enabled`, a join keyed on
  * (`seen_bucket`, `url_hash`) becomes STORAGE-PARTITIONED: Spark shuffles
  * only the (round-sized) candidate side into the bucket grouping and the
  * 10^10-row history is scanned in place — no Exchange above the seen scan
  * even on the fallback path, which retires `seenFlipMax` as a scale
  * dependency.
  *
  * Row decoding uses parquet-hadoop's record reader (the schema is two thin
  * columns; column pruning is pushed — probes read `url_hash` alone). At
  * sandbox scale this is fast enough for the fallback's regime (giant
  * candidate rounds, where join cost dominates scan decode); the flip path
  * keeps Spark's vectorized parquet scan.
  */
class SeenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SeenSource.schema
  override def inferPartitioning(options: CaseInsensitiveStringMap): Array[Transform] =
    Array(Expressions.identity("seen_bucket"))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new SeenTable(
      opts.getOrElse(SeenSource.PathsKey, "").split(',').filter(_.nonEmpty).toSeq,
      opts.getOrElse(SeenSource.BucketsKey, "16").toInt)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object SeenSource {
  val PathsKey = "seenpaths"
  val BucketsKey = "buckets"
  /** `url_hash`/`url` are declared nullable because the reader CAN emit
    * null for a data column a file stores as optional-absent — declaring
    * non-nullable while emitting null is undefined behavior under codegen
    * (engine-written files never do this, but the schema must cover what
    * the reader can produce). `seen_bucket` comes from the directory name,
    * never null. */
  val schema: StructType = StructType(Seq(
    StructField("url_hash", LongType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("seen_bucket", IntegerType, nullable = false)))

  /** The committed seen history (dirs from the catalog manifests) as a
    * bucket-partitioning-reporting DataFrame. */
  def load(spark: org.apache.spark.sql.SparkSession, paths: Seq[String],
      buckets: Int): org.apache.spark.sql.DataFrame =
    spark.read.format(classOf[SeenSource].getName)
      .option(PathsKey, paths.mkString(","))
      .option(BucketsKey, buckets.toString)
      .load()
}

class SeenTable(paths: Seq[String], buckets: Int) extends Table with SupportsRead {
  override def name(): String = s"icelite_seen(${paths.length} filesets, $buckets buckets)"
  override def schema(): StructType = SeenSource.schema
  override def partitioning(): Array[Transform] = Array(Expressions.identity("seen_bucket"))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // capture the SESSION hadoop conf here (driver side, active session) —
    // both the driver-side file listing and the executor-side readers use it
    new SeenScanBuilder(paths, buckets,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
}

class SeenScanBuilder(paths: Seq[String], buckets: Int, conf: SerializableHadoopConf)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SeenSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve declared column order regardless of the requested order
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(SeenSource.schema.filter(f => keep.contains(f.name)))
  }
  override def build(): Scan = new SeenScan(paths, buckets, required, conf)
}

class SeenScan(paths: Seq[String], buckets: Int, required: StructType,
    conf: SerializableHadoopConf)
  extends Scan with Batch with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"icelite seen [${required.fieldNames.mkString(",")}] bucketed($buckets)"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("seen_bucket")), buckets)

  /** One partition per bucket: every `seen_bucket=b` file across every
    * committed file set. Empty buckets still yield a (fileless) partition so
    * the key set is total — the partitioning contract is one group per
    * bucket value. */
  override def planInputPartitions(): Array[InputPartition] = {
    val byBucket = Array.fill(buckets)(Vector.newBuilder[String])
    paths.foreach { dir =>
      val root = new Path(dir)
      val fs = root.getFileSystem(conf.value)
      fs.listStatus(root).foreach { st: FileStatus =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("seen_bucket=")) {
          val b = n.stripPrefix("seen_bucket=").toInt
          require(b >= 0 && b < buckets, s"bucket $b outside layout of $buckets")
          fs.listStatus(st.getPath)
            .filter(f => f.getPath.getName.startsWith("part-") && f.getLen > 0)
            .foreach(f => byBucket(b) += f.getPath.toString)
        }
      }
    }
    (0 until buckets).map(b => SeenInputPartition(b, byBucket(b).result()): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SeenReaderFactory(required.fieldNames, conf)
}

case class SeenInputPartition(bucket: Int, files: Seq[String])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(Array[Any](bucket))
}

class SeenReaderFactory(columns: Array[String], conf: SerializableHadoopConf)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SeenInputPartition]
    new SeenPartitionReader(p.bucket, p.files, columns, conf)
  }
}

/** Streams the bucket's files through parquet-hadoop's record reader,
  * projecting to the requested data columns (parquet read-schema pushdown —
  * a key-only probe decodes just `url_hash`). */
class SeenPartitionReader(bucket: Int, files: Seq[String], columns: Array[String],
    conf: SerializableHadoopConf)
  extends PartitionReader[InternalRow] {

  private val dataCols = columns.filter(_ != "seen_bucket")

  /** Projection built from the file's own footer schema (field repetition
    * must match the file exactly — parquet rejects an optional/required
    * mismatch), pruned to the requested data columns. */
  private def confFor(path: Path, base: Configuration): Configuration = {
    val c = new Configuration(base)
    if (dataCols.nonEmpty) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, base)
      val footer = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val fileSchema = try footer.getFileMetaData.getSchema finally footer.close()
      val proj = new org.apache.parquet.schema.MessageType("seen",
        dataCols.map(n => (fileSchema: org.apache.parquet.schema.GroupType).getType(n)): _*)
      c.set(ReadSupport.PARQUET_READ_SCHEMA, proj.toString)
    }
    c
  }

  private val baseConf = conf.value
  private val fileIter = files.iterator
  private var reader: ParquetReader[org.apache.parquet.example.data.Group] = _
  private var current: org.apache.parquet.example.data.Group = _

  override def next(): Boolean = {
    while (true) {
      if (reader == null) {
        if (!fileIter.hasNext) return false
        val path = new Path(fileIter.next())
        reader = ParquetReader.builder(new GroupReadSupport(), path)
          .withConf(confFor(path, baseConf)).build()
      }
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
    }
    false // unreachable
  }

  private val extractors: Array[() => Any] = columns.map {
    case "url_hash" => () =>
      if (current.getFieldRepetitionCount("url_hash") == 0) null
      else current.getLong("url_hash", 0)
    case "url" => () =>
      if (current.getFieldRepetitionCount("url") == 0) null
      else UTF8String.fromBytes(current.getBinary("url", 0).getBytes)
    case "seen_bucket" => () => bucket
  }

  override def get(): InternalRow = {
    val vals = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) { vals(i) = extractors(i)(); i += 1 }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
