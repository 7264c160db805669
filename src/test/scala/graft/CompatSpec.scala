package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.compat.Compat

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_warehouse_").toString)
    .getOrCreate()
}

/** Pins the reference's compatibility semantics (SURVEY §1.2) at their
  * boundary values — the cases the sf fixtures can't reach. */
class CompatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withIndex: sorted, non-unique allowed, survives as ordinary column (arc_utils.py:629-632)") {
    val df = Seq((3, "c"), (1, "a"), (3, "b"), (2, "x")).toDF("idx", "v")
    val out = Compat.withIndex(df, "idx")
    assert(out.schema("idx").metadata.getBoolean(Compat.IndexKey))
    assert(out.select("idx").collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3, 3))
    assert(out.columns.toSeq == Seq("idx", "v")) // index stays a normal column
  }

  test("sentinel fill: numeric -1, string '', date 1678-01-01") {
    val df = Seq(
      (Some(1.5), Some("a"), Some(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))),
      (None: Option[Double], None: Option[String], None: Option[java.sql.Timestamp])
    ).toDF("d", "s", "t")
    val filled = Compat.fillSentinels(df).collect()
    assert(filled(1).getDouble(0) == -1.0)
    assert(filled(1).getString(1) == "")
    assert(filled(1).getTimestamp(2) == java.sql.Timestamp.valueOf("1678-01-01 00:00:00"))
    assert(filled(0).getDouble(0) == 1.5) // non-nulls untouched
  }

  test("sentinel unfill: -1/''/'nan'/date-fill back to NULL (arc_utils.py:741-746)") {
    val df = Seq(
      (-1.0, "nan", java.sql.Timestamp.valueOf("1678-01-01 00:00:00")),
      (2.0, "", java.sql.Timestamp.valueOf("2020-06-01 00:00:00")),
      (3.0, "ok", java.sql.Timestamp.valueOf("2021-06-01 00:00:00"))
    ).toDF("d", "s", "t")
    val un = Compat.unfillSentinels(df).collect()
    assert(un(0).isNullAt(0) && un(0).isNullAt(1) && un(0).isNullAt(2))
    assert(un(1).getDouble(0) == 2.0 && un(1).isNullAt(1)) // '' also nulls
    assert(un(2).getString(1) == "ok")
  }

  test("fill→unfill round-trips nulls") {
    val df = Seq((Some(7.0), Some("x")), (None: Option[Double], None: Option[String]))
      .toDF("d", "s")
    val rt = Compat.unfillSentinels(Compat.fillSentinels(df)).collect()
    assert(rt(1).isNullAt(0) && rt(1).isNullAt(1))
  }

  test("timestamp clamp window 1677-09-22..2262-04-12 (arc_utils.py:717-718)") {
    val df = Seq(
      java.sql.Timestamp.valueOf("1677-09-21 23:59:59"), // below → null
      java.sql.Timestamp.valueOf("1677-09-22 00:00:00"), // at lower bound → kept
      java.sql.Timestamp.valueOf("2000-01-01 00:00:00"), // in range → kept
      java.sql.Timestamp.valueOf("2262-04-12 00:00:00"), // at upper bound → kept
      java.sql.Timestamp.valueOf("2262-04-13 00:00:00")  // above → null
    ).toDF("t")
    val got = df.select(Compat.clampTimestamp($"t").as("t")).collect().map(r => r.isNullAt(0))
    assert(got.toSeq == Seq(true, false, false, false, true))
  }

  test("downcast boundary: |v| <= 2147483647 → int32, beyond → float64, bool → int32") {
    val fits = Seq(2147483647L, -2147483647L).toDF("v")
    val over = Seq(2147483648L, 0L).toDF("v")
    assert(Compat.downcastLongs(fits).schema("v").dataType == IntegerType)
    assert(Compat.downcastLongs(over).schema("v").dataType == DoubleType)
    val b = Seq(true, false).toDF("b")
    val bd = Compat.downcastLongs(b)
    assert(bd.schema("b").dataType == IntegerType)
    assert(bd.collect().map(_.getInt(0)).toSeq == Seq(1, 0))
  }

  test("case-insensitive select, output takes requested case (arc_utils.py:1036-1049)") {
    val df = Seq((1, "x")).toDF("Zoning_Code", "other")
    val out = Compat.selectRequestedCase(df, Seq("ZONING_code"))
    assert(out.columns.toSeq == Seq("ZONING_code"))
    assertThrows[IllegalArgumentException] {
      Compat.selectRequestedCase(df, Seq("nope"))
    }
  }

  test("ArcGIS where-dialect translation table (arc_utils.py:471-474,704-708 feed arcpy SQL)") {
    import graft.operators.WhereDialect.toSparkSql
    val cases = Seq(
      // bracketed (personal gdb) and double-quoted (file gdb) field delimiters
      "[POP2000] > 50000"                  -> "`POP2000` > 50000",
      "\"COUNTY\" = 'Maricopa'"            -> "`COUNTY` = 'Maricopa'",
      "[A] = 1 AND \"B\" = 2"              -> "`A` = 1 AND `B` = 2",
      // Access datetime literals, all spellings, date reordered to ISO
      "[d] >= #3/15/1995#"                 -> "`d` >= TIMESTAMP '1995-03-15 00:00:00'",
      "[d] >= #03-15-1995 8:30#"           -> "`d` >= TIMESTAMP '1995-03-15 08:30:00'",
      "[d] >= #1995-3-5 08:30:15#"         -> "`d` >= TIMESTAMP '1995-03-05 08:30:15'",
      // GETDATE() SQL-Server-ism
      "[d] < GETDATE()"                    -> "`d` < current_timestamp()",
      "[d] < getdate ()"                   -> "`d` < current_timestamp ()",
      // string literals are never rewritten, including delimiters inside them
      "name = 'it''s [not] a \"field\"'"   -> "name = 'it''s [not] a \"field\"'",
      "tag LIKE '%#5%'"                    -> "tag LIKE '%#5%'",
      // plain Spark SQL and Esri-standard spellings pass through unchanged
      "p_size > 25 AND p_brand <> 'B'"     -> "p_size > 25 AND p_brand <> 'B'",
      "d >= TIMESTAMP '1995-03-15 00:00:00'" -> "d >= TIMESTAMP '1995-03-15 00:00:00'",
      "x BETWEEN 1 AND 10 OR y IS NULL"    -> "x BETWEEN 1 AND 10 OR y IS NULL",
      "CHAR_LENGTH(s) = 5 AND s LIKE 'a_c%' ESCAPE '$'" ->
        "CHAR_LENGTH(s) = 5 AND s LIKE 'a_c%' ESCAPE '$'",
      // unterminated delimiters degrade to raw pass-through (Spark reports)
      "[unclosed > 1"                      -> "[unclosed > 1")
    for ((in, expected) <- cases)
      assert(toSparkSql(in) == expected, s"input: $in")
  }

  test("Graft.arcToTable: the composed arc_to_pandas front door (spatial + fill + index)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    Session.withScratch { s =>
      Seq(
        (2L, Some("x"), Some(1.0), 0.0, 0.0, 4.0, 2.0, 8.0, 12.0),
        (1L, None, None, 1.0, 1.0, 3.0, 5.0, 8.0, 12.0))
        .toDF("id", "tag", "v", "xmin", "ymin", "xmax", "ymax", "area", "length")
        .select(col("id"), col("tag"), col("v"),
          struct(col("xmin"), col("ymin"), col("xmax"), col("ymax"),
                 col("area"), col("length")).as("geom"))
        .write.mode("overwrite").parquet(s"${s.dir}/feats.parquet")
      val out = Graft.arcToTable(spark, s.dir, "feats",
        indexFld = Some("id"), spatial = true)
      val rows = out.collect()
      // index sort applied
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      // sentinel fill: string '' and numeric -1 for the injected nulls
      assert(rows(0).getString(1) == "" && rows(0).getDouble(2) == -1.0)
      // spatial=true derived scalars present and computed from the struct
      val r1 = rows(0)
      assert(out.columns.contains("shape_x") && out.columns.contains("shape_area"))
      assert(r1.getDouble(out.columns.indexOf("shape_x")) == 2.0) // (1+3)/2
      assert(r1.getDouble(out.columns.indexOf("shape_area")) == 8.0)
    }
  }

  test("Graft.tableToArc: the composed pandas_to_arc front door (index drop + cursor + overwrite default)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    Session.withScratch { s =>
      val df = Compat.withIndex(
        Seq((3L, "aa", 1.5), (1L, "bb", 2.5), (2L, "cc", 3.5))
          .toDF("id", "tag", "v"), "id")
      // keepIndex=false drops the IndexKey-marked column; getCursor reads back
      val cur = Graft.tableToArc(df, s.dir, "t1", keepIndex = false,
        getCursor = true).get
      assert(!cur.columns.contains("id") && cur.count() == 3)
      // keepIndex=true (default) keeps it, downcast to int32 on the way out
      val cur2 = Graft.tableToArc(df, s.dir, "t2", getCursor = true,
        xCol = Some("v"), yCol = Some("v"), srs = Some(4326)).get
      assert(cur2.columns.contains("id"))
      assert(cur2.schema("id").dataType ==
        org.apache.spark.sql.types.IntegerType)
      assert(cur2.columns.contains("geom")) // XY→point derived
      // reference default overwrite=False: second write to the same name errors
      intercept[Exception] { Graft.tableToArc(df, s.dir, "t1") }
    }
  }

  test("dialect where-strings filter correctly through create_layer") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1, "a", "2020-01-01 00:00:00"), (2, "b", "2021-06-15 12:00:00"))
      .toDF("id", "tag", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val out = graft.operators.Layers.createLayer(spark, df, "dialect_probe",
      where = Some("[ts] >= #6/1/2021# AND \"tag\" = 'b'"))
    assert(out.select("id").collect().map(_.getInt(0)).toSeq == Seq(2))
  }
}
