package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Enterprise-DB connector — SURVEY §2.1 S7.
  *
  * The reference's `get_db_conn` (`/root/reference/smartpy_arc/arc_utils.py:
  * 339-373`) builds a SQL Server connection descriptor: server + database +
  * OS authentication + a named version (default `sde.DEFAULT`). Spark's
  * analog is a JDBC reader; the "version" concept has no JDBC equivalent and
  * is carried as an application-intent property so a downstream session can
  * branch on it.
  *
  * Scale notes: JDBC scans parallelize only when given a partition column —
  * `partitioned` sets (partitionColumn, lowerBound, upperBound, numPartitions)
  * so the scan issues N range-predicated queries instead of one single-threaded
  * cursor. Predicate pushdown applies (Spark compiles `filter`s into the
  * generated WHERE); column pruning reaches the SELECT list.
  */
object Jdbc {

  /** Connection URL for SQL Server with OS (integrated) auth — the
    * reference's defaults (`arc_utils.py:350-356`). */
  def sqlServerUrl(server: String, database: String,
                   integratedSecurity: Boolean = true): String =
    s"jdbc:sqlserver://$server;databaseName=$database" +
      (if (integratedSecurity) ";integratedSecurity=true" else "")

  /** Connection properties incl. the reference's versioned-view marker. */
  def props(version: String = "sde.DEFAULT"): java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("applicationIntent", "ReadOnly")
    p.setProperty("graft.version", version)
    p
  }

  /** Single-cursor read against any JDBC URL (small tables / dims). */
  def readUrl(spark: SparkSession, url: String, table: String,
              connProps: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, connProps)

  /** Range-partitioned parallel read against any JDBC URL (the 100-TB
    * path): N executors each issue one range-predicated query. */
  def partitionedUrl(spark: SparkSession, url: String, table: String,
                     partitionColumn: String, lowerBound: Long, upperBound: Long,
                     numPartitions: Int,
                     connProps: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table,
      partitionColumn, lowerBound, upperBound, numPartitions, connProps)

  /** Single-cursor read (small tables / dims). */
  def read(spark: SparkSession, server: String, database: String,
           table: String, version: String = "sde.DEFAULT"): DataFrame =
    readUrl(spark, sqlServerUrl(server, database), table, props(version))

  /** Range-partitioned parallel read (the 100-TB path). */
  def partitioned(spark: SparkSession, server: String, database: String,
                  table: String, partitionColumn: String,
                  lowerBound: Long, upperBound: Long, numPartitions: Int,
                  version: String = "sde.DEFAULT"): DataFrame =
    partitionedUrl(spark, sqlServerUrl(server, database), table,
      partitionColumn, lowerBound, upperBound, numPartitions, props(version))
}
