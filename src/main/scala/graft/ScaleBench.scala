package graft

import org.apache.spark.sql.SparkSession

/** Fleet-wide 10× scale-step measurement (VERDICT r11 #4): the other
  * ~250 registered queries' growth, beyond the 8 risk paths
  * ScalingCurveSpec pins.
  *
  * Protocol: one full warm pass over the registry at the BASE sf dir
  * picks the TOPN slowest queries; each of those then runs min-of-2 at
  * the base and min-of-2 at the [[ScaleFixture]]-derived 10× corpus
  * (documents/embeddings/events ×10, TPC-H tables symlinked). The
  * artifact records per-query (base_s, scaled_s, ratio) plus which
  * scaled tables the query actually scans — a query that reads only
  * unscaled dims legitimately shows ratio ≈ 1 and is excluded from the
  * superlinear flag. Queries with ratio > FLAG_RATIO (default 15×, vs
  * the ~10× a linear operator shows with constant overheads) land in
  * "flagged": the next round's work list.
  *
  * Output contract mirrors [[Bench]]: ONE compact JSON line printed
  * last (metric "scale10"), backed by target/scale10_ratios.json.
  */
object ScaleBench {
  private val FLAG_RATIO = 15.0

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val topN = sys.env.getOrElse("SPARK_GRAFT_SCALE_TOPN", "30").toInt
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val scaleDir = s"target/scale${scale}fleet"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleFixture.ensure(spark, baseDir, scaleDir, scale)

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, dir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[scale] FAILED on $dir: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      if (ok) dt else -dt
    }

    /** Leaf parquet scan locations of the query's BASE plan that hit one
      * of the scaled tables — ratio ≈ 1 on a dims-only query is then
      * self-explaining in the artifact. */
    def scaledScans(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[String] = {
      val scaledNames = Seq("documents", "embeddings", "events")
      try {
        val plan = fn(spark, baseDir).queryExecution.optimizedPlan
        val hit = scala.collection.mutable.SortedSet[String]()
        plan.foreach {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            r.relation match {
              case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                h.location.rootPaths.foreach { p =>
                  scaledNames.foreach { t =>
                    if (p.toString.contains(s"$t.parquet")) hit += t
                  }
                }
              case _ => ()
            }
          case _ => ()
        }
        hit.toSeq
      } catch { case scala.util.control.NonFatal(_) => Seq("unknown") }
    }

    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm the session the same way Bench does
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    System.err.println(s"[scale] base pass over ${all.size} queries")
    val basePass = all.map { case (name, fn) => name -> time(fn, baseDir) }
    val slowest = basePass.filter(_._2 > 0).sortBy(-_._2).take(topN)
    System.err.println(s"[scale] top-$topN slowest: " +
      slowest.take(5).map { case (n, t) => f"$n=$t%.2f" }.mkString(", "))

    val rows = slowest.map { case (name, t1) =>
      val fn = all.find(_._1 == name).get._2
      val base = math.min(t1, math.abs(time(fn, baseDir)))
      val s1 = time(fn, scaleDir)
      val s2 = time(fn, scaleDir)
      val scaled =
        if (s1 < 0 && s2 < 0) math.min(s1, s2) // both failed: negative marker
        else math.min(if (s1 > 0) s1 else Double.MaxValue,
          if (s2 > 0) s2 else Double.MaxValue)
      val tables = scaledScans(fn)
      val ratio = if (scaled > 0 && base > 0) scaled / base else -1.0
      (name, base, scaled, ratio, tables)
    }
    // flag on ratio alone: scan attribution is best-effort (a memoized
    // localCheckpoint build hides the parquet relation — q_bigram_lm
    // reads documents but shows scaled_tables=[]), and a dims-only query
    // growing 15x would be worth a look anyway
    val flagged = rows.collect {
      case (name, _, _, ratio, _) if ratio > FLAG_RATIO => name
    }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val qjson = rows.map { case (name, b, s, r, tables) =>
      val ts = tables.map(t => s"\"" + t + "\"").mkString("[", ",", "]")
      s"\"" + name + s"\":{\"base_s\":$b,\"scaled_s\":$s,\"ratio\":$r,\"scaled_tables\":$ts}"
    }.mkString("{", ",", "}")
    val fjson = flagged.map(n => s"\"" + n + "\"").mkString("[", ",", "]")
    val out =
      s"""{"metric":"scale10","scale":$scale,"top_n":${rows.size},"flag_ratio":$FLAG_RATIO,"flagged":$fjson,"loadavg_end":$load,"queries":$qjson,"base_sf":"$baseDir"}"""
    try {
      val p = java.nio.file.Paths.get("target/scale10_ratios.json")
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (out + "\n").getBytes("UTF-8"))
      ()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[scale] could not write artifact: ${e.getMessage}")
    }
    spark.stop()
    println(out)
    System.out.flush()
  }
}
