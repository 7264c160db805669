package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

import scala.collection.mutable

/** Dev profiler (not part of the driver contract): run ONE query and print
  * every Spark job it launches — wall-clock, task count, and the call site
  * that triggered it — so multi-statement protocol faces (catalog DML,
  * streaming ingest) can be broken down job by job. The bench itself stays
  * untouched; this is the guide §1.1 "empirical: find where the time goes"
  * loop for faces whose cost is many tiny jobs rather than one big stage.
  *
  * Usage: runMain graft.tools.JobTrace <sfDir> <queryName> [reps]
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class J(id: Int, var desc: String = "", var site: String = "",
                 var start: Long = 0L, var end: Long = 0L, var nTasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
        j.start = e.time
        j.desc = Option(e.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))).getOrElse("")
        j.site = e.stageInfos.lastOption.map(_.name).getOrElse("")
        j.nTasks = e.stageInfos.map(_.numTasks).sum
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute tasks to the job via stage->job mapping is overkill; skip
      }
    }

    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { rep =>
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain
      val rows = jobs.values.toSeq
      val covered = rows.map(j => (j.end - j.start).max(0L)).sum / 1e3
      println(f"JOBTRACE $name rep=$rep wall=$wall%.2f s, ${rows.size} jobs, job-time sum=$covered%.2f s")
      if (rep == reps) {
        var prevEnd = 0L
        rows.foreach { j =>
          val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
          prevEnd = j.end
          println(f"  job ${j.id}%4d ${(j.end - j.start).max(0L) / 1e3}%7.3f s (gap $gap%6.3f s, ${j.nTasks}%3d tasks)  ${j.site.take(70)}")
        }
      }
    }
    graft.Session.clearScratch()
    spark.stop()
  }
}
