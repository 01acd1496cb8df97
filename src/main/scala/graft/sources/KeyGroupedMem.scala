package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal DataSource V2 catalog whose tables REPORT their physical
  * layout: each table is stored pre-grouped by one integer key column,
  * its Scan reports [[KeyGroupedPartitioning]] over identity(keyCol),
  * and every InputPartition carries its key via [[HasPartitionKey]] —
  * the three ingredients Spark's storage-partitioned join (SPJ) needs
  * to plan a join between two such tables with NO shuffle exchange on
  * EITHER side (`spark.sql.sources.v2.bucketing.enabled`).
  *
  * This is the DSv2 tier of the pay-shuffle-once story (round-15
  * verdict item 4): the builtin-bucketed-table twin (q_join_bucketed)
  * proves the FileSourceScan path; this catalog proves the CONNECTOR
  * path — how an Iceberg/Delta-style table with declared partitioning
  * joins exchange-free at 100 TB. The in-memory row store is the
  * demonstration vehicle, not the scale claim: a production connector
  * streams each partition from storage, and everything Spark sees
  * (catalog → table → scan → partitioning report → per-partition
  * reader) is identical.
  *
  * Registry, not constructor, carries the data: Spark instantiates the
  * catalog plugin reflectively from the conf, so tables register into
  * the JVM-global [[KeyGroupedMem]] map under dir-scoped names (the
  * same collision policy as FileFormats.dirTag). */
object KeyGroupedMem {

  /** One stored table: schema, the grouped rows (one entry per distinct
    * key, each row already in Catalyst internal form), and which column
    * is the key. Rows hold only primitives (Long/Int/Double) — the
    * partitions ship inside task closures and must serialize. */
  final case class Spec(schema: StructType, keyCol: String,
                        parts: Array[(Int, Array[Array[Any]])])

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  def register(name: String, spec: Spec): Unit = tables.put(name, spec)
  def contains(name: String): Boolean = tables.containsKey(name)
  private[sources] def get(name: String): Option[Spec] =
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
    spec.parts.map { case (k, rows) => KeyGroupedMemPartition(k, rows) }
  override def createReaderFactory(): PartitionReaderFactory =
    new KeyGroupedMemReaderFactory
}

/** One key group. partitionKey() is how SPJ aligns the two sides'
  * partitions without any exchange — it must match the reported
  * identity(keyCol) transform's type (IntegerType here). */
final case class KeyGroupedMemPartition(key: Int, rows: Array[Array[Any]])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(key)
}

class KeyGroupedMemReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[KeyGroupedMemPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = InternalRow.fromSeq(
        rows(i).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
