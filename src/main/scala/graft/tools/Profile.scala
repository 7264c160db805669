package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev profiler: run selected queries N times in one session, print per-run
  * wall clock (run 1 carries codegen/scan warmup; later runs are steady
  * state) and optionally the formatted plan.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <reps> [explain] <name>...
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val explain = args.contains("explain")
    val names = args.drop(2).filterNot(_ == "explain")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, not count(): count lets Catalyst prune every column the
        // row count doesn't need, hiding scalar-projection cost (Bench note).
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
