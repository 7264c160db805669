package graft.sources

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The reference's *workspace* as a Spark `TableCatalog` — "DataFrame I/O
  * with custom connectors" (BASELINE.json `spark_approach`).
  *
  * A workspace is a directory; a table is `<dir>/<name>.parquet`
  * (`/root/reference/smartpy_arc/arc_pandas.py:17-21` — folder/.gdb/.sde
  * workspaces; `arc_utils.py:33-39` — tables addressed by name within the
  * current workspace). Registering
  *
  * {{{
  *   spark.sql.catalog.graft           = graft.sources.WorkspaceCatalog
  *   spark.sql.catalog.graft.workspace = /data/sf0.01
  * }}}
  *
  * makes every fixture table addressable as `graft.<name>` from SQL and
  * `spark.table`. Name resolution is case-insensitive with the on-disk
  * spelling winning (§1.2 semantics); a miss raises `NoSuchTableException`
  * like the reference's uniqueness-checked lookup (`pro_utils.py:99-103`).
  *
  * `loadTable` returns Spark's OWN `ParquetTable`, so every DSv2
  * optimization — filter pushdown, column pruning, vectorized reads,
  * partition pruning — applies unchanged (asserted in the spec). The
  * catalog adds the *naming and catalog semantics*, not a byte-level
  * reader; that is exactly the split the reference has (arcpy executes,
  * smartpy_arc names and coerces).
  */
class WorkspaceCatalog extends TableCatalog {
  private var catalogName: String = _
  private var workspace: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    workspace = options.get("workspace")
    require(workspace != null,
      s"spark.sql.catalog.$name.workspace must point to a directory of parquet tables")
  }
  override def name(): String = catalogName

  private def dirEntries(): Seq[String] = {
    val d = new java.io.File(workspace)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    dirEntries().map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    // case-insensitive resolve, on-disk spelling wins (SURVEY §1.2)
    val actual = dirEntries().find(_.equalsIgnoreCase(ident.name()))
      .getOrElse(throw new NoSuchTableException(ident.namespace() :+ ident.name()))
    ParquetTable(
      actual,
      SparkSession.active,
      CaseInsensitiveStringMap.empty(),
      Seq(s"$workspace/$actual.parquet"),
      None,
      classOf[ParquetFileFormat])
  }

  // Read-only catalog: the write path goes through Sinks (S4/S8/S9), which
  // target a workspace directory directly.
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("read-only workspace catalog; use Sinks.writeTable")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("read-only workspace catalog")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("read-only workspace catalog")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("read-only workspace catalog")
}
