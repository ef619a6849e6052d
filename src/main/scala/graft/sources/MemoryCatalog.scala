package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal in-memory `TableCatalog` — the second-catalog fixture the
  * MULTI-CATALOG lineage encoding needs (VERDICT r15 #2): three-part
  * `catalog.db.table` names only arise on a session with a non-default
  * catalog, and the runtime jars ship no test catalog. Register with
  * `spark.sql.catalog.<name>=graft.sources.MemoryCatalog`; tables are
  * SCHEMA-ONLY and read as empty (zero input partitions) — lineage
  * analyzes plans and never executes them, so metadata is the whole
  * contract, and an empty BATCH_READ keeps `CheckAnalysis`'s
  * capability check honest for plain SELECTs.
  *
  * This is the catalog-plugin face of the same surface the reference
  * exposes through its JDBC metadata SPI (`MetaDataQueryImpl.java:
  * 29-44` — sink schemas from a second system's catalog); here the
  * second system is Spark's own `CatalogPlugin` tier, so
  * `spark.table("cat.db.t")` resolves it with no provider special
  * casing. */
class MemoryCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private val tables =
    new ConcurrentHashMap[Identifier, MemoryCatalog.MemTable]()
  private val namespaces =
    ConcurrentHashMap.newKeySet[Seq[String]]()

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    tables.keySet().toArray(Array.empty[Identifier])
      .filter(_.namespace.sameElements(namespace))
  }

  override def loadTable(ident: Identifier): Table = {
    val t = tables.get(ident)
    if (t == null) throw new NoSuchTableException(
      (name() +: ident.namespace.toSeq) :+ ident.name)
    t
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val t = MemoryCatalog.MemTable(
      (name() +: ident.namespace.toSeq :+ ident.name).mkString("."), schema)
    if (tables.putIfAbsent(ident, t) != null)
      throw new TableAlreadyExistsException(
        (name() +: ident.namespace.toSeq) :+ ident.name)
    namespaces.add(ident.namespace.toSeq)
    t
  }

  // Schema evolution is not this fixture's job — fail by name rather
  // than silently acknowledging a change that was never applied.
  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"MemoryCatalog is a schema-only lineage fixture; ALTER TABLE " +
        s"$ident is not supported")

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(ident) != null

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val t = tables.remove(oldIdent)
    if (t == null) throw new NoSuchTableException(
      (name() +: oldIdent.namespace.toSeq) :+ oldIdent.name)
    tables.put(newIdent, t.copy(tableName =
      (name() +: newIdent.namespace.toSeq :+ newIdent.name).mkString(".")))
  }

  // -- namespaces: explicit creations plus those implied by tables ----

  private def allNamespaces: Set[Seq[String]] = {
    import scala.jdk.CollectionConverters._
    namespaces.asScala.toSet ++
      tables.keySet().asScala.map(_.namespace.toSeq)
  }

  override def listNamespaces(): Array[Array[String]] =
    allNamespaces.map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    allNamespaces.filter(ns => ns.length > namespace.length &&
      ns.startsWith(namespace.toSeq)).map(_.toArray).toArray

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || allNamespaces.contains(namespace.toSeq)

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(name() +: namespace.toSeq)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    if (!namespaces.add(namespace.toSeq))
      throw new NamespaceAlreadyExistsException((name() +: namespace.toSeq).toArray)

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "MemoryCatalog namespaces carry no alterable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = {
    val inNs = tables.keySet().toArray(Array.empty[Identifier])
      .filter(_.namespace.sameElements(namespace))
    if (!cascade && inNs.nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    // The namespace may exist only IMPLICITLY via its tables (ADVICE
    // r16): capture existence BEFORE mutation, or a cascade drop that
    // actually removed tables reports "nothing dropped".
    val existed = namespaces.contains(namespace.toSeq) || inNs.nonEmpty
    inNs.foreach(tables.remove)
    namespaces.remove(namespace.toSeq)
    existed
  }
}

object MemoryCatalog {

  /** Schema-only table: reads as zero partitions. */
  final case class MemTable(tableName: String, tableSchema: StructType)
      extends Table with SupportsRead {
    override def name(): String = tableName
    override def schema(): StructType = tableSchema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(
        options: CaseInsensitiveStringMap): ScanBuilder =
      new ScanBuilder {
        override def build(): Scan = new Scan {
          override def readSchema(): StructType = tableSchema
          override def toBatch: Batch = new Batch {
            override def planInputPartitions(): Array[InputPartition] =
              Array.empty
            override def createReaderFactory(): PartitionReaderFactory =
              EmptyReaderFactory
          }
        }
      }
  }

  /** Never invoked (zero partitions) — fails by name if it ever is. */
  private object EmptyReaderFactory extends PartitionReaderFactory {
    override def createReader(
        partition: InputPartition): PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] =
      throw new IllegalStateException(
        "MemoryCatalog tables are empty: no partition should reach a reader")
  }
}
