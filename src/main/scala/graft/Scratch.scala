package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway dev stage-profiler for the r14 optimization round: per-stage
  * duration/tasks/bytes for named registered queries. NOT driver contract;
  * deleted when the investigation closes.
  *
  * Usage: SPARK_GRAFT_ONLY=q_a,q_b sbt 'runMain graft.Scratch [sfDir]'
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write
      .format("noop").mode("overwrite").save()

    case class St(id: Int, name: String, tasks: Int, ms: Long,
                  shw: Long, shr: Long, in: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (for {a <- si.submissionTime; b <- si.completionTime}
          yield b - a).getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(St(si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, dur, m.shuffleWriteMetrics.bytesWritten,
          m.shuffleReadMetrics.totalBytesRead, m.inputMetrics.bytesRead))
      }
    })

    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q_fuzzy_names")
      .split(",").map(_.trim)
    val passes = sys.env.getOrElse("SCRATCH_PASSES", "3").toInt
    only.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to passes).foreach { pass =>
        stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener drains async; settle briefly
        Thread.sleep(300)
        if (pass == passes) {
          println(f"===== $name pass $pass total $dt%7.3f s")
          import scala.jdk.CollectionConverters._
          stages.asScala.toSeq.sortBy(_.id).foreach { s =>
            println(f"  stage ${s.id}%4d ${s.ms}%6d ms ${s.tasks}%4d tasks " +
              f"shw=${s.shw / 1024}%8d KB shr=${s.shr / 1024}%8d KB " +
              f"in=${s.in / 1024}%8d KB  ${s.name}")
          }
        } else println(f"===== $name pass $pass total $dt%7.3f s")
      }
    }
    spark.stop()
  }
}
