package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal DataSource V2 catalog whose tables REPORT their physical
  * layout: each table is a directory of parquet files pre-grouped by
  * one integer key column (one Hive-style `key=<k>` subdirectory per
  * key value), its Scan reports [[KeyGroupedPartitioning]] over
  * identity(keyCol), and every InputPartition carries its key via
  * [[HasPartitionKey]] — the three ingredients Spark's
  * storage-partitioned join (SPJ) needs to plan a join between two
  * such tables with NO shuffle exchange on EITHER side
  * (`spark.sql.sources.v2.bucketing.enabled`).
  *
  * This is the DSv2 tier of the pay-shuffle-once story (round-15
  * verdict item 4; storage-backed since round 16): the
  * builtin-bucketed-table twin (q_join_bucketed) proves the
  * FileSourceScan path; this catalog proves the CONNECTOR path — how
  * an Iceberg/Delta-style table with declared partitioning joins
  * exchange-free at 100 TB. Each partition reader STREAMS its key
  * group's parquet files record-by-record (parquet-hadoop's example
  * Group API — deliberately independent of Spark's reader, as a real
  * external connector would be); nothing is ever collected to the
  * driver, so the vehicle is exact at ANY scale — the round-15
  * `spjMaxRows` driver-memory sample gate is deleted, not widened.
  * The registry carries only (schema, key column, file paths per
  * key): the driver-side footprint of a table is its file listing.
  *
  * Registry, not constructor, carries the metadata: Spark instantiates
  * the catalog plugin reflectively from the conf, so tables register
  * into the JVM-global [[KeyGroupedMem]] map under dir-scoped names
  * (the same collision policy as FileFormats.dirTag). Readers open
  * files with a default Hadoop Configuration — local-filesystem paths
  * here; a production deployment would thread its cluster conf
  * through the factory the same way. */
object KeyGroupedMem {

  /** One stored table: schema, the key column, and the parquet files
    * of each key group (`parts(i) = (keyValue, files)`). The key
    * column itself is NOT in the data files (it is the Hive partition
    * directory); readers re-inject it as a per-partition constant.
    * Only Int/Long/Double data columns are supported — the fixture's
    * SPJ tables need nothing wider, and each type maps 1:1 onto a
    * parquet-example Group getter. */
  final case class Spec(schema: StructType, keyCol: String,
                        parts: Array[(Int, Array[String])])

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  def register(name: String, spec: Spec): Unit = tables.put(name, spec)
  def contains(name: String): Boolean = tables.containsKey(name)
  private[graft] def get(name: String): Option[Spec] =
    Option(tables.get(name))
}

class KeyGroupedMemCatalog extends TableCatalog {
  private var catName: String = "graftmem"
  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catName = name
  override def name(): String = catName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  override def loadTable(ident: Identifier): Table =
    KeyGroupedMem.get(ident.name())
      .map(new KeyGroupedMemTable(ident.name(), _))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident))

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String])
      : Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only catalog")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier)
      : Unit =
    throw new UnsupportedOperationException("read-only catalog")
}

class KeyGroupedMemTable(tableName: String, spec: KeyGroupedMem.Spec)
    extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = spec.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity(spec.keyCol))
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KeyGroupedMemScan(spec)
    }
}

class KeyGroupedMemScan(spec: KeyGroupedMem.Spec)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = spec.schema
  override def toBatch: Batch = this
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity(spec.keyCol)), spec.parts.length)
  override def planInputPartitions(): Array[InputPartition] =
    spec.parts.map { case (k, files) => KeyGroupedMemPartition(k, files) }
  override def createReaderFactory(): PartitionReaderFactory =
    new KeyGroupedMemReaderFactory(spec.schema, spec.keyCol)
}

/** One key group: its key value and its parquet files. partitionKey()
  * is how SPJ aligns the two sides' partitions without any exchange —
  * it must match the reported identity(keyCol) transform's type
  * (IntegerType here). Ships only strings to the task. */
final case class KeyGroupedMemPartition(key: Int, files: Array[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key)
}

/** Executor-side reader: streams the partition's parquet files one
  * record at a time through parquet-hadoop's example Group API and
  * re-injects the partition key as a constant — constant memory per
  * task regardless of group size. */
class KeyGroupedMemReaderFactory(schema: StructType, keyCol: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    import org.apache.parquet.example.data.Group
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val part = p.asInstanceOf[KeyGroupedMemPartition]
    val fields = schema.fields
    new PartitionReader[InternalRow] {
      private var fileIdx = -1
      private var reader: ParquetReader[Group] = null
      private var cur: Group = null
      @annotation.tailrec
      private def advance(): Boolean = {
        if (reader != null) {
          cur = reader.read()
          if (cur != null) return true
          reader.close(); reader = null
        }
        fileIdx += 1
        if (fileIdx >= part.files.length) false
        else {
          reader = ParquetReader
            .builder(new GroupReadSupport(),
              new org.apache.hadoop.fs.Path(part.files(fileIdx)))
            .build()
          advance()
        }
      }
      override def next(): Boolean = advance()
      override def get(): InternalRow = InternalRow.fromSeq(
        fields.toIndexedSeq.map { f =>
          if (f.name == keyCol) part.key
          else f.dataType match {
            case LongType => cur.getLong(f.name, 0)
            case IntegerType => cur.getInteger(f.name, 0)
            case DoubleType => cur.getDouble(f.name, 0)
            case t => sys.error(
              s"KeyGroupedMem: unsupported column type $t for ${f.name}")
          }
        })
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
