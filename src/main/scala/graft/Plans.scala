package graft

import java.io.{File, PrintWriter}

import org.apache.spark.sql.SparkSession

/** Plan-audit main: dumps the formatted physical plan of every registered
  * query to one file for review (pushdown reached the scan? broadcasts
  * where intended? no surprise exchanges?). Dev tool, not driver contract.
  *
  * Usage: sbt 'runMain graft.Plans [sfDir] [outFile]'
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("target/plans.txt")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pw = new PrintWriter(new File(out))
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        pw.println(s"\n${"=" * 78}\nQUERY $name\n${"=" * 78}")
        try {
          val df = fn(spark, sfDir)
          // force execution so AQE finalizes the real plan
          df.write.format("noop").mode("overwrite").save()
          pw.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch { case e: Throwable => pw.println(s"ERROR: $e") }
      }
    } finally pw.close()
    println(s"PLANS_WRITTEN $out")
    spark.stop()
  }
}
