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

  test("listTables enumerates the workspace") {
    enable()
    import scala.jdk.CollectionConverters._
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val names = cat.listTables(Array.empty).map(_.name()).toSet
    assert(Tables.All.toSet.subsetOf(names))
  }
}
