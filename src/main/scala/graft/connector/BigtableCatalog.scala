package graft.connector

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Catalog plugin (SURVEY.md §3.3(c)) — the third registration surface
  * after `spark.read.format("bigtable")` and `CREATE TABLE ... USING`:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.bt", "graft.connector.BigtableCatalog")
  *   spark.sql("SELECT * FROM bt.default.weather_balloons WHERE ...")
  * }}}
  *
  * Table definitions come from [[BigtableCatalogDefs]] (programmatic,
  * the emulator's metastore stand-in) or from `CREATE TABLE
  * bt.default.t (...) USING bigtable OPTIONS (...)` DDL, which
  * registers the options as a definition. A production deployment
  * would back this with Bigtable's admin API (table/family listing)
  * plus a schema registry.
  */
class BigtableCatalog extends TableCatalog {
  private var catalogName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    BigtableCatalogDefs
      .list(catalogName)
      .map(t => Identifier.of(namespace, t))
      .toArray

  override def loadTable(ident: Identifier): Table =
    BigtableCatalogDefs
      .get(catalogName, ident.name())
      .map(new BigtableTable(_))
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))

  override def tableExists(ident: Identifier): Boolean =
    BigtableCatalogDefs.get(catalogName, ident.name()).isDefined

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]
  ): Table = {
    val cfg = BigtableConfig.fromOptions(properties)
    BigtableCatalogDefs.register(catalogName, ident.name(), cfg)
    new BigtableTable(cfg)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("bigtable tables are schema-on-register; re-create instead")

  override def dropTable(ident: Identifier): Boolean =
    BigtableCatalogDefs.drop(catalogName, ident.name())

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val cfg = BigtableCatalogDefs
      .get(catalogName, oldIdent.name())
      .getOrElse(throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(oldIdent))
    BigtableCatalogDefs.register(catalogName, newIdent.name(), cfg)
    BigtableCatalogDefs.drop(catalogName, oldIdent.name())
  }
}

/** JVM-wide table-definition registry keyed by (catalog, table) — the
  * metastore stand-in backing [[BigtableCatalog]].
  */
object BigtableCatalogDefs {
  private val defs = new ConcurrentHashMap[(String, String), BigtableConfig]()

  def register(catalog: String, table: String, cfg: BigtableConfig): Unit =
    defs.put((catalog, table), cfg)

  def get(catalog: String, table: String): Option[BigtableConfig] =
    Option(defs.get((catalog, table)))

  def drop(catalog: String, table: String): Boolean =
    defs.remove((catalog, table)) != null

  def list(catalog: String): Seq[String] =
    defs.keySet().asScala.collect { case (c, t) if c == catalog => t }.toSeq.sorted
}
