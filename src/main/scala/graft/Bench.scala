package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink rather than `count()`:
  * count() lets Catalyst prune the aggregate/projection columns, which
  * under-measures the work a real consumer pays; noop evaluates every
  * output column and discards it (the honest "execute the full plan"
  * measurement, same idea as a 100 TB job writing parquet minus the IO).
  */
object Bench {
  /** 1-minute system load average — host-noise telemetry for the bench
    * artifacts (VERDICT r11 #3): a cold pass reading 30% high is
    * self-explaining when the artifact records the competing load. */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Number of OTHER live JVMs on the host (this process excluded) — the
    * usual competing-load culprit on a shared bench box. Best-effort:
    * -1 when the process table can't be read. */
  private def otherJvms(): Long =
    try {
      val self = ProcessHandle.current().pid()
      var n = 0L
      ProcessHandle.allProcesses().forEach { p =>
        if (p.pid() != self &&
          p.info().command().map[Boolean](_.contains("java")).orElse(false))
          n += 1
      }
      n
    } catch { case scala.util.control.NonFatal(_) => -1L }

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    val sfDir0 = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Coalesce post-shuffle partitions by SIZE (AQE advisory target)
      // instead of stopping at defaultParallelism: the r14 fleet A/B
      // measured 178.3 s → 166.0 s (263 queries, sf0.1) from collapsing
      // KB-sized 32-task reduce stages into 1-2 tasks. Scale-adaptive by
      // construction — at production volumes the advisory size (default
      // 64 MB; production would raise it to 256 MB per the tuning guide)
      // yields thousands of partitions and this flag only stops tiny
      // stages from being sharded to the cluster's full width. Env
      // override restores the stock posture for A/B re-measurement.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
      // Let the planner pick shuffled-hash join when its size conditions
      // hold (guide §3.1/§9): no sort on either shuffled side. A/B knob
      // for clean re-measurement (r13 flagged the first attempt as
      // host-load-ambiguous); default set from the measured fleet A/B —
      // see OPTIMIZATION_r14.md.
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
      // A/B knobs for the r15 quiet-host re-measures (VERDICT r14 #5);
      // both DEFAULT to stock values — no behavior change unless set.
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "64m"))
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "lz4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-only multi-split mode (SPARK_GRAFT_MULTISPLIT=1): bench against
    // the re-sharded same-data twin of the fixture so the 8-vs-32-core
    // scaling leg measures plan parallelism instead of the single-row-
    // group stage-latency floor (VERDICT r14 #5). The driver sets no env
    // and always benches the base fixture.
    val sfDir =
      if (sys.env.get("SPARK_GRAFT_MULTISPLIT").contains("1"))
        ShardFixture.ensure(spark, sfDir0)
      else sfDir0
    // Warm the JVM/codegen/parquet-reader paths once so first-query timings
    // measure the query, not classloading (a real cluster amortizes this
    // over hours; a 30-query bench run must not bill it to one query).
    spark.range(1000).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write
      .format("noop").mode("overwrite").save()
    // Fleet-total byte movement (shuffle/spill/input) across the whole
    // measured run — one snapshot pair, zero per-query overhead. Time is
    // host-sensitive; bytes are not: round-over-round, these numbers move
    // only when plans change, and a growing shuffle total is the scale
    // signal wall-clock can hide. Warmup above is excluded.
    // settled(), not snap(): warmup stage events still queued on the async
    // bus at install time would otherwise land AFTER the start snapshot
    // and be billed to the measured delta
    val stageAgg = StageMetrics.install(spark)
    val bytesStart = stageAgg.settled()
    // Contention-proofing: a shared host can slow this JVM 4-6x for the
    // duration of a competing job, which says nothing about the plans. Run
    // PASSES full passes over the query set and report each query's MINIMUM.
    // Passes are interleaved (q1..qN, q1..qN, ...) rather than back-to-back
    // per query, so a contention burst shorter than one pass (~45 s at
    // sf0.1) cannot hit every sample of any single query.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // dev-only subset filter (comma-separated names), mirroring Verify;
    // the driver sets no env and always benches the full registry
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // dev-only changed-only mode (SPARK_GRAFT_BENCH_CHANGED_ONLY=1): skip
    // queries whose implementing source file — and the shared core — are
    // byte-identical to the previous run's manifest, carrying their prior
    // mins into the output (flagged in "carried"). The driver sets no env
    // and always runs the full fleet; this bounds DEV iteration wall time
    // as the registry grows (253 × ~0.8 s × passes is minutes per spin).
    val changedOnly =
      sys.env.get("SPARK_GRAFT_BENCH_CHANGED_ONLY").contains("1")
    val manifest = BenchManifest.load()
    // carried must respect the same subset filter as the live runs: with
    // both env vars set, a carried query outside ONLY would otherwise
    // sneak into the output JSON and the headline total (ADVICE r11)
    val carried: Map[String, Double] =
      (if (!changedOnly || manifest.isEmpty) Map.empty[String, Double]
       else BenchManifest.carriable(manifest.get))
        .filter { case (name, _) => only.forall(_.contains(name)) }
    val allNames = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val names = allNames.filterNot { case (name, _) => carried.contains(name) }
    if (carried.nonEmpty)
      System.err.println(
        s"[bench] changed-only: carrying ${carried.size} unchanged-file " +
          s"queries from manifest, running ${names.size}")
    // first-touch tracking: a query whose run performed a shared
    // memo/index/lab build ([[BuildMeter]]) gets flagged, so
    // round-over-round diffs can separate build cost from plan cost
    val touched = scala.collection.mutable.Set[String]()
    // samples keep their pass index: pass 1 is the COLD pass (first-touch
    // memo/index builds + per-query codegen land there), later passes are
    // steady state — min-over-passes is the plan cost, pass-1 is what a
    // fresh job pays. Both are reported (bench_cold.json vs the summary).
    val samples = (1 to passes).flatMap { pass =>
      names.map { case (name, fn) =>
        val b0 = BuildMeter.count
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        // failed queries report negative elapsed so they can't masquerade
        // as fast successes in BENCH_r{N}.json
        val dt = (System.nanoTime() - t0) / 1e9 * (if (ok) 1 else -1)
        if (BuildMeter.count > b0) touched += name
        // isolate queries: drop caches a query created so the next one isn't
        // measured under its memory pressure
        spark.catalog.clearCache()
        (pass, name, dt)
      }
    }
    // Per-query: min over samples, but if ANY pass failed the query is
    // flaky and reports a negative marker — min-over-passes must not let
    // an intermittent failure masquerade as a clean fast success.
    def summarize(stat: Seq[Double] => Double) = names.map { case (name, _) =>
      val ts = samples.collect { case (_, `name`, dt) => dt }
      val good = ts.filter(_ > 0)
      val clean = good.size == ts.size && good.nonEmpty
      name -> (if (clean) stat(good)
               else if (good.nonEmpty) -stat(good)
               else ts.min)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val ran = summarize(_.min)
    // carried queries ride along at their manifest min so the headline
    // total stays full-fleet-comparable; they are flagged, never silent
    val results = (ran ++ carried.toSeq).sortBy(_._1)
    // Medians ride along for round-over-round attribution: mins answer
    // "how fast is the plan", medians answer "did the code actually
    // change" — host-contention jitter moves mins between rounds on
    // identical code, while medians are far more stable.
    val medians = summarize(median)
    def asJson(kvs: Seq[(String, Double)]) =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val qs = asJson(results)
    val ms = asJson(medians)
    val ft = names.map { case (name, _) =>
      s"\"" + name + "\":" + touched.contains(name)
    }.mkString("{", ",", "}")
    val carriedJson = carried.keys.toSeq.sorted
      .map(k => s"\"" + k + "\"").mkString("[", ",", "]")
    // total counts SUCCESSFUL queries only — a failure (negative marker)
    // must never make the headline number smaller
    val total = results.map(_._2).filter(_ > 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"medians":$ms,"first_touch":$ft,"carried":$carriedJson,"sf":"$sfDir"}""")
    def summaryJson(metric: String, kvs: Seq[(String, Double)],
                    extra: String): String = {
      val good = kvs.map(_._2).filter(_ > 0)
      val nFailed = kvs.size - good.size
      val tot = good.sum
      val meanS = if (good.nonEmpty) tot / good.size else 0.0
      val medS = if (good.nonEmpty) median(good) else 0.0
      val slowest = kvs.filter(_._2 > 0).sortBy(-_._2).take(5)
        .map { case (k, v) => s"""["$k",$v]""" }.mkString("[", ",", "]")
      s"""{"metric":"$metric","total_s":$tot,"n":${good.size},"n_failed":$nFailed,"mean_s":$meanS,"median_s":$medS,"slowest":$slowest$extra,"unit":"sec","sf":"$sfDir"}"""
    }
    // Cold-run artifact (VERDICT r10 #1): pass-1 timings, i.e. what a
    // fresh JVM pays INCLUDING first-touch memo/index builds and per-query
    // codegen — the conservative number that used to live only in
    // BASELINE.md prose. Steady state is the min-based summary below;
    // the gap between the two is exactly the amortized build cost.
    val cold = names.map { case (name, _) =>
      name -> samples.collectFirst { case (1, `name`, dt) => dt }.getOrElse(0.0)
    }
    // host-noise telemetry (VERDICT r11 #3): both artifacts carry the
    // loadavg at JVM start and at measurement end plus the competing-JVM
    // count, so a judge can discount a host-loaded pass without rerunning
    val host =
      s""","loadavg_start":$loadStart,"loadavg_end":${loadAvg()}""" +
        s""","other_jvms":${otherJvms()}"""
    val coldSummary = summaryJson("bench_cold", cold,
      s""","first_touch_n":${touched.size},"passes":$passes$host""")
    // Compact summary printed LAST: the driver keeps only the tail of the
    // output, and the detail line above is ~40 KB with the total at its
    // head — so every BENCH_r*.json through round 8 recorded parsed:null.
    // This second line is small enough to always survive the tail capture
    // and carries everything the 2x-of-baseline acceptance gate needs.
    val bytes = stageAgg.settled() - bytesStart
    import StageMetrics.mb
    val byteJson =
      s""","passes":$passes,"shuffle_write_mb":${mb(bytes.shuffleWrite)}""" +
        s""","shuffle_read_mb":${mb(bytes.shuffleRead)}""" +
        s""","spill_mb":${mb(bytes.spill)},"input_mb":${mb(bytes.input)}"""
    val summary = summaryJson("bench_summary", results,
      s""","n_carried":${carried.size}$host$byteJson""")
    // Belt and braces for the driver's parser: (a) the summary also lands
    // in a bare file no log framework can decorate; (b) stop Spark BEFORE
    // the final println so no shutdown chatter can print after it; the
    // summary JSON is the absolute last stdout line of the forked JVM
    // (build.sbt's StdoutOutput keeps it free of the "[info] " prefix).
    // File writes are best-effort (create target/ if missing, swallow IO
    // failure): a cwd without ./target must not be able to throw before
    // spark.stop() and suppress the very stdout line the files back up.
    def writeQuiet(path: String, text: String): Unit =
      try {
        val p = java.nio.file.Paths.get(path)
        if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, (text + "\n").getBytes("UTF-8"))
        ()
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not write $path: ${e.getMessage}")
      }
    writeQuiet("target/bench_cold.json", coldSummary)
    writeQuiet("target/bench_summary.json", summary)
    BenchManifest.save(results, carried.keySet)
    spark.stop()
    println(coldSummary)
    println(summary)
    System.out.flush()
  }
}
