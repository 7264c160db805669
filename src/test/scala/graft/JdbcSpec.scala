package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Jdbc

/** S7 `get_db_conn` end-to-end against an EMBEDDED Derby database (ships in
  * Spark's jars — no server needed): proves the reader actually reads, the
  * range partitioning issues N parallel queries, and filters push into the
  * generated SQL. The SQL-Server URL builder itself stays covered in
  * SinksSpec (no server in this environment).
  */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE obs") catch { case _: java.sql.SQLException => () }
      st.execute("CREATE TABLE obs (id BIGINT NOT NULL, grp VARCHAR(8), val DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO obs VALUES (?, ?, ?)")
      (0 until 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"g${i % 4}"); ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("S7 JDBC: partitioned range-read issues N queries and returns all rows") {
    seed()
    val df = Jdbc.partitionedUrl(spark, url, "obs", "id",
      lowerBound = 0L, upperBound = 100L, numPartitions = 4)
    // 4 range-predicated cursors, not one single-threaded scan
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100L)
    assert(df.agg(sum(col("id"))).head().getLong(0) == 4950L)
  }

  test("S7 JDBC: filter pushes into the generated WHERE, projection prunes the SELECT") {
    seed()
    val df = Jdbc.readUrl(spark, url, "obs")
      .filter(col("grp") === "g1")
      .select("id")
    val plan = df.queryExecution.executedPlan.toString
    // the JDBC scan node carries the pushed predicate and the pruned column
    // list (Derby uppercases unquoted identifiers)
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.toUpperCase.contains("EQUALTO(GRP,G1)"), plan)
    assert(plan.contains("ReadSchema: struct<ID:bigint>"), plan)
    assert(df.count() == 25L)
  }
}
