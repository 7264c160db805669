package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SchemaEvolution

/** Declared-target conformance: null-fill, drop, cast, column order. */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val target = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("conform: null-fills missing, drops extras, casts drift, orders columns") {
    val df = Seq((1, "a", true), (2, "b", false)).toDF("id", "extra", "flag")
    val out = SchemaEvolution.conform(df, target)
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      target.map(f => (f.name, f.dataType)))
    val rows = out.collect()
    assert(rows.forall(r => r.isNullAt(1) && r.isNullAt(2))) // name, score null
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L)) // int -> long cast
  }

  test("readConformed: mergeSchema union + conformance across file generations") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "x")).toDF("id", "name").write.mode("overwrite").parquet(dir)
    Seq((2L, 0.5, "drop")).toDF("id", "score", "junk")
      .write.mode("append").parquet(dir)
    val out = SchemaEvolution.readConformed(spark, dir, target)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getString(1) == "x" && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).getDouble(2) == 0.5)
    assert(!SchemaEvolution.readConformed(spark, dir, target)
      .columns.contains("junk"))
  }
}
