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

  test("listTables enumerates the workspace") {
    enable()
    import scala.jdk.CollectionConverters._
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val names = cat.listTables(Array.empty).map(_.name()).toSet
    assert(Tables.All.toSet.subsetOf(names))
  }
}
