package graft
object DbgIns {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val s = new graft.Session.Scratch
    val cat = "snapsql_" + java.lang.Long.toHexString(System.nanoTime() & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.workspace", s.dir)
    spark.sql(s"CREATE TABLE $cat.life (id BIGINT, v STRING)")
    println("COUNT0=" + spark.sql(s"SELECT COUNT(*) FROM $cat.life").first().getLong(0))
    try {
      spark.sql(s"INSERT INTO $cat.life VALUES (1, 'a'), (2, 'b')")
      println("INSERT OK, count=" + spark.table(s"$cat.life").count())
    } catch { case e: Throwable => println("INSERT FAILED: " + e.getMessage.take(200)) }
  }
}
