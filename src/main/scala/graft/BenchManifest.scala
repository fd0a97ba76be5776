package graft

/** Persistence for [[Bench]]'s dev-only changed-only mode.
  *
  * The manifest (target/bench_manifest.tsv) records, per benched query,
  * the MD5 of the source file implementing it ([[SparkEntry
  * .registryGroups]] gives the attribution for free — the registry is
  * assembled per file) plus that query's last measured min, and one
  * "core" hash over every OTHER main-source file (Tables, functions,
  * DistNtile, plan rules, build.sbt — the shared substrate every query
  * rides on). A query's timing is carriable only when BOTH its group
  * file and the core are byte-identical to the manifest: a change to
  * shared code conservatively invalidates the whole fleet.
  *
  * This is a development accelerator, not an accuracy claim — the
  * default (and the driver's only mode) remains the full fleet; a
  * carried number is last run's measurement, flagged as such in the
  * output, never re-blessed.
  */
object BenchManifest {
  private val PATH = "target/bench_manifest.tsv"
  private val SRC = "src/main/scala/graft"

  final case class Manifest(core: String, groups: Map[String, String],
                            mins: Map[String, (String, Double)])

  private def md5(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  private def fileMd5(p: java.nio.file.Path): String =
    md5(java.nio.file.Files.readAllBytes(p))

  private def groupFiles: Set[String] =
    SparkEntry.registryGroups.map(_._1).toSet

  /** MD5 of each registry group's source file, or None when the source
    * tree isn't under the cwd (bench run outside the repo — mode off). */
  private def groupHashes(): Option[Map[String, String]] = {
    val root = java.nio.file.Paths.get(SRC)
    if (!java.nio.file.Files.isDirectory(root)) None
    else scala.util.Try {
      groupFiles.iterator.map { rel =>
        rel -> fileMd5(root.resolve(rel))
      }.toMap
    }.toOption
  }

  /** One hash over every main-source file that is NOT a registry group
    * file (sorted relative paths — directory iteration order must not
    * change the hash), plus build.sbt. */
  private def coreHash(): Option[String] = {
    val root = java.nio.file.Paths.get(SRC)
    if (!java.nio.file.Files.isDirectory(root)) None
    else scala.util.Try {
      val st = java.nio.file.Files.walk(root)
      val files =
        try st.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".scala") &&
            !groupFiles.contains(root.relativize(p).toString))
        finally st.close()
      val parts = files.sortBy(_.toString).map(p =>
        s"${root.relativize(p)}=${fileMd5(p)}")
      val sbt = java.nio.file.Paths.get("build.sbt")
      val all = parts ++ (if (java.nio.file.Files.exists(sbt))
        Seq(s"build.sbt=${fileMd5(sbt)}") else Nil)
      md5(all.mkString("\n").getBytes("UTF-8"))
    }.toOption
  }

  def load(): Option[Manifest] = scala.util.Try {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(PATH)).toArray.toSeq.map(_.toString)
    var core = ""
    val groups = Map.newBuilder[String, String]
    val mins = Map.newBuilder[String, (String, Double)]
    lines.foreach { l =>
      l.split("\t") match {
        case Array("core", h) => core = h
        case Array("group", f, h) => groups += f -> h
        // 5th field (fresh|carried) is provenance only — a carried min is
        // still carriable as long as its file hashes match
        case Array("q", name, f, t, _*) => mins += name -> (f, t.toDouble)
        case _ => ()
      }
    }
    Manifest(core, groups.result(), mins.result())
  }.toOption

  /** Queries whose group file AND the core match the manifest, with the
    * manifest's recorded (positive) min — the set changed-only can skip. */
  def carriable(m: Manifest): Map[String, Double] =
    (coreHash(), groupHashes()) match {
      case (Some(core), Some(gh)) if core == m.core =>
        m.mins.collect {
          case (name, (file, t))
              if t > 0 && gh.get(file).contains(m.groups.getOrElse(file, "")) =>
            name -> t
        }
      case _ => Map.empty
    }

  /** Write the manifest for the NEXT run: current hashes + per-query
    * mins. Rows re-recorded from a prior manifest (the `carried` set)
    * are tagged `carried` so a manifest reader can see how stale a
    * number is — a fresh measurement always re-tags the row `fresh`.
    * Best-effort — a failure only disables the accelerator. */
  def save(results: Seq[(String, Double)], carried: Set[String]): Unit =
    (coreHash(), groupHashes()) match {
      case (Some(core), Some(gh)) =>
        val fileOf: Map[String, String] = SparkEntry.registryGroups.flatMap {
          case (f, qs) => qs.map(q => q.name -> f)
        }.toMap
        val sb = new StringBuilder
        sb ++= s"core\t$core\n"
        gh.toSeq.sorted.foreach { case (f, h) => sb ++= s"group\t$f\t$h\n" }
        results.foreach { case (name, t) =>
          fileOf.get(name).foreach { f =>
            val tag = if (carried.contains(name)) "carried" else "fresh"
            if (t > 0) sb ++= s"q\t$name\t$f\t$t\t$tag\n"
          }
        }
        try {
          val p = java.nio.file.Paths.get(PATH)
          if (p.getParent != null)
            java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
          ()
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] could not write $PATH: ${e.getMessage}")
        }
      case _ => ()
    }
}
