package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (one entry per implemented
  * SURVEY §2 op); `oracleSql` carries the DuckDB-equivalent SQL for every
  * SQL-expressible query, which the driver hash-compares at sf0.01.
  */
object SparkEntry {

  /** All declared query packs. Order is presentational only. */
  def packs: Seq[Q] = RelationalQueries.all ++ PipelineQueries.all ++ CurationQueries.all

  /** Flagship pipeline on sf0.001 (driver smoke-checks rows>0): scan with
    * pushdown → sentinel-fill compat → broadcast dim join → exact-decimal agg. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
      .filter(col("l_quantity") > 0)
    val orders = Tables.load(spark, dir, "orders")
    compat.Compat.fillSentinels(li)
      .join(broadcast(orders), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent SQL per query (omitted → driver does rows-only check). */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
