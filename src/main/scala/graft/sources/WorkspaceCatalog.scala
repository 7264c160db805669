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

  // Path probing via the Hadoop FileSystem API, not java.io.File — a
  // workspace may live on hdfs://, s3a://, or any configured filesystem.
  private def fs(path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private def dirEntries(): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(workspace)
    val f = fs(root)
    if (!f.exists(root)) Nil
    else f.listStatus(root).toSeq.map(_.getPath.getName)
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

  // ---- write path (round 10) ----------------------------------------------
  // The reference's workspace is READ-WRITE: `pandas_to_arc` lands a table
  // in the current workspace (`arc_utils.py:815-898`) honoring the overwrite
  // flag (`arc_utils.py:121-135`). The Spark-catalog face of that is SQL DDL
  // + DML against `graft.<name>`: CREATE TABLE AS SELECT, INSERT INTO,
  // INSERT OVERWRITE, DROP TABLE, ALTER TABLE RENAME. Spark's non-atomic
  // DSv2 exec nodes (CreateTableAsSelectExec etc.) drive exactly these
  // hooks; the returned `ParquetTable` is a `SupportsWrite` FileTable, so
  // appends/truncates go through Spark's own vectorized parquet writer with
  // full executor-side parallelism — the catalog only places the directory.

  private def tablePath(name: String) =
    new org.apache.hadoop.fs.Path(s"$workspace/$name.parquet")

  /** CREATE TABLE: place `<workspace>/<name>.parquet` and seed it with an
    * empty parquet file carrying the declared schema, so the table survives
    * a session restart (schema lives in the parquet footer, not in catalog
    * memory) and an immediate read returns zero rows rather than a
    * schema-inference failure. CTAS appends its query result right after. */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "workspace tables are unpartitioned (a table is one directory, like the reference's)")
    if (dirEntries().exists(_.equalsIgnoreCase(ident.name())))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        ident.namespace() :+ ident.name())
    val spark = SparkSession.active
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("overwrite").parquet(tablePath(ident.name()).toString)
    loadTable(ident)
  }

  /** DROP: reports honestly — a deletion the filesystem refuses (held
    * locks, permissions) throws rather than returning a false success. */
  override def dropTable(ident: Identifier): Boolean =
    dirEntries().find(_.equalsIgnoreCase(ident.name())) match {
      case None => false
      case Some(actual) =>
        val p = tablePath(actual)
        if (!fs(p).delete(p, true))
          throw new IllegalStateException(s"DROP failed: could not delete $p")
        true
    }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val actual = dirEntries().find(_.equalsIgnoreCase(oldIdent.name()))
      .getOrElse(throw new NoSuchTableException(oldIdent.namespace() :+ oldIdent.name()))
    if (dirEntries().exists(_.equalsIgnoreCase(newIdent.name())))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        newIdent.namespace() :+ newIdent.name())
    val (from, to) = (tablePath(actual), tablePath(newIdent.name()))
    if (!fs(from).rename(from, to))
      throw new IllegalStateException(
        s"rename ${oldIdent.name()} -> ${newIdent.name()} failed")
  }

  // Parquet-backed tables don't do in-place schema evolution; the
  // reference's model is the same (drop + rewrite).
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "workspace tables don't support ALTER; rewrite via CREATE OR REPLACE TABLE ... AS")
}
