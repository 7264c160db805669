package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer.
  *
  * The reference resolves (workspace, table-name) pairs against an ambient
  * "current workspace" (`/root/reference/smartpy_arc/arc_utils.py:93-118`,
  * `arc_pandas.py:17-21`). Here a workspace is simply a directory of parquet
  * files; a table is `dir/name.parquet`. All driver fixtures
  * (`/root/repo/TESTDATA.md`) follow this layout.
  *
  * At cluster scale this is the thinnest possible veneer over Spark's
  * DataSource V2 parquet reader, so predicate pushdown, column pruning and
  * partition pruning all apply unchanged.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Scan one table. Pure `spark.read.parquet` — no eager materialization;
    * Catalyst handles pruning/pushdown from whatever the caller stacks on. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every fixture table as a temp view so SQL surface tests can
    * reference them by name (the reference's "workspace" catalog,
    * `arc_utils.py:33-39`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    All.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
