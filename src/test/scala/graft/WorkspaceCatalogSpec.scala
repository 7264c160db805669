package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

/** Workspace TableCatalog: name resolution + full DSv2 pushdown delegation. */
class WorkspaceCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def enable(): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.WorkspaceCatalog")
    spark.conf.set("spark.sql.catalog.graft.workspace", sf)
  }

  test("tables resolve by name through the catalog; values match direct reads") {
    enable()
    val viaCatalog = spark.sql("SELECT count(*) AS n FROM graft.nation").first().getLong(0)
    assert(viaCatalog == Tables.load(spark, sf, "nation").count())
  }

  test("case-insensitive resolution (SURVEY §1.2), miss raises like pro_utils.py:99-103") {
    enable()
    assert(spark.sql("SELECT count(*) AS n FROM graft.NATION").first().getLong(0) == 25)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT * FROM graft.no_such_table").collect()
    }
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("pushdown and pruning reach the parquet scan through the catalog") {
    enable()
    val df = spark.sql(
      "SELECT l_orderkey FROM graft.lineitem WHERE l_quantity > 45")
    val plan = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"), plan)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).get
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice"), readSchema)
    assert(df.count() > 0)
  }

  test("write path: CTAS + INSERT INTO + INSERT OVERWRITE + RENAME + DROP") {
    val scratch = new Session.Scratch
    spark.conf.set("spark.sql.catalog.graftrw", "graft.sources.WorkspaceCatalog")
    spark.conf.set("spark.sql.catalog.graftrw.workspace", scratch.dir)
    // CTAS lands <workspace>/<name>.parquet
    spark.sql(s"CREATE TABLE graftrw.top_nations AS " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey < 10")
    assert(new java.io.File(s"${scratch.dir}/top_nations.parquet").isDirectory)
    assert(spark.sql("SELECT count(*) AS n FROM graftrw.top_nations").first().getLong(0) == 10)
    // DML append
    spark.sql(s"INSERT INTO graftrw.top_nations " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey >= 20")
    assert(spark.sql("SELECT count(*) AS n FROM graftrw.top_nations").first().getLong(0) == 15)
    // C2 overwrite semantics
    spark.sql(s"INSERT OVERWRITE graftrw.top_nations " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey = 0")
    assert(spark.sql("SELECT count(*) AS n FROM graftrw.top_nations").first().getLong(0) == 1)
    // duplicate CREATE raises; RENAME moves the directory; DROP removes it
    intercept[Exception] {
      spark.sql("CREATE TABLE graftrw.TOP_NATIONS (x INT)")
    }
    spark.sql("ALTER TABLE graftrw.top_nations RENAME TO nations_kept")
    assert(!new java.io.File(s"${scratch.dir}/top_nations.parquet").exists())
    assert(spark.sql("SELECT count(*) AS n FROM graftrw.nations_kept").first().getLong(0) == 1)
    spark.sql("DROP TABLE graftrw.nations_kept")
    assert(!new java.io.File(s"${scratch.dir}/nations_kept.parquet").exists())
    spark.sql("DROP TABLE IF EXISTS graftrw.nations_kept") // no-throw on missing
  }

  test("empty created table reads back zero rows with the declared schema") {
    val scratch = new Session.Scratch
    spark.conf.set("spark.sql.catalog.graftrw2", "graft.sources.WorkspaceCatalog")
    spark.conf.set("spark.sql.catalog.graftrw2.workspace", scratch.dir)
    spark.sql("CREATE TABLE graftrw2.empty_t (id BIGINT, name STRING)")
    val df = spark.table("graftrw2.empty_t")
    assert(df.count() == 0)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name"))
  }

  test("zero-row INSERT OVERWRITE leaves a readable empty table (sidecar survives truncate)") {
    val scratch = new Session.Scratch
    spark.conf.set("spark.sql.catalog.graftrw3", "graft.sources.WorkspaceCatalog")
    spark.conf.set("spark.sql.catalog.graftrw3.workspace", scratch.dir)
    spark.sql(s"CREATE TABLE graftrw3.zr AS " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet`")
    assert(spark.sql("SELECT count(*) AS n FROM graftrw3.zr").first().getLong(0) == 25)
    // an overwrite whose query yields ZERO rows removes every data file
    // (and possibly the directory) — the table must stay readable with its
    // declared schema, not fail schema inference
    spark.sql(s"INSERT OVERWRITE graftrw3.zr " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey < 0")
    val df = spark.table("graftrw3.zr")
    assert(df.count() == 0)
    assert(df.schema.fieldNames.toSeq == Seq("n_nationkey", "n_name"))
    // and it comes back to life on the next insert
    spark.sql(s"INSERT INTO graftrw3.zr " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey < 5")
    assert(spark.sql("SELECT count(*) AS n FROM graftrw3.zr").first().getLong(0) == 5)
  }

  test("ALTER TABLE ADD COLUMN is metadata-only: old rows read null, new inserts carry it") {
    val scratch = new Session.Scratch
    spark.conf.set("spark.sql.catalog.graftalt", "graft.sources.WorkspaceCatalog")
    spark.conf.set("spark.sql.catalog.graftalt.workspace", scratch.dir)
    spark.sql(s"CREATE TABLE graftalt.evo AS " +
      s"SELECT n_nationkey, n_name FROM parquet.`$sf/nation.parquet` WHERE n_nationkey < 3")
    val filesBefore = Option(new java.io.File(s"${scratch.dir}/evo.parquet").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    spark.sql("ALTER TABLE graftalt.evo ADD COLUMN score DOUBLE")
    // metadata-only: no data file rewritten
    val filesAfter = Option(new java.io.File(s"${scratch.dir}/evo.parquet").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    assert(filesAfter == filesBefore, "ADD COLUMN must not rewrite data files")
    // old rows conform with null; new-schema inserts carry the value
    spark.sql("INSERT INTO graftalt.evo VALUES (99, 'NEWLAND', 0.5)")
    val rows = spark.sql(
      "SELECT n_nationkey, score FROM graftalt.evo ORDER BY n_nationkey").collect()
    assert(rows.length == 4)
    assert(rows.take(3).forall(_.isNullAt(1)), "pre-ALTER rows must read null")
    assert(rows.last.getDouble(1) == 0.5)
    // only nullable top-level adds; other ALTERs still rejected with guidance
    intercept[Exception] { spark.sql("ALTER TABLE graftalt.evo DROP COLUMN score") }
    intercept[Exception] { spark.sql("ALTER TABLE graftalt.evo ADD COLUMN score STRING") }
  }

  test("pushdown and pruning survive the declared-schema (post-ALTER) read path") {
    val scratch = new Session.Scratch
    spark.conf.set("spark.sql.catalog.graftpd", "graft.sources.WorkspaceCatalog")
    spark.conf.set("spark.sql.catalog.graftpd.workspace", scratch.dir)
    spark.sql(s"CREATE TABLE graftpd.pd AS " +
      s"SELECT l_orderkey, l_quantity, l_extendedprice FROM parquet.`$sf/lineitem.parquet`")
    spark.sql("ALTER TABLE graftpd.pd ADD COLUMN note STRING")
    // the table now serves through a user-specified schema (the sidecar);
    // filters must still reach the parquet scan and the read schema must
    // still prune to the requested columns
    val df = spark.sql("SELECT l_orderkey FROM graftpd.pd WHERE l_quantity > 45")
    val plan = df.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"), plan)
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema:")).get
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_extendedprice") &&
      !readSchema.contains("note"), readSchema)
    assert(df.count() > 0)
  }

  test("listTables enumerates the workspace") {
    enable()
    import scala.jdk.CollectionConverters._
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val names = cat.listTables(Array.empty).map(_.name()).toSet
    assert(Tables.All.toSet.subsetOf(names))
  }
}
