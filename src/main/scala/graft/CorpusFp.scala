package graft

/** Shared fixture fingerprint + memo sweep for every per-(session, dir,
  * fingerprint) operator memo ([[operators.Dedup]], [[operators.Graph]],
  * [[operators.Profiling]], [[operators.TextAnalysis]]).
  *
  * The fingerprint folds (name, length, mtime) of every part file backing
  * a table with an order-sensitive hash, so `listFiles()` — whose order is
  * UNSPECIFIED — must be sorted first: an unsorted fold can fingerprint
  * the SAME fixture differently across filesystems/JVMs, and a changed key
  * forces a spurious rebuild while the old localCheckpoint-pinned memo
  * entry lingers until session stop (ADVICE r10).
  */
object CorpusFp {
  def of(dir: String, table: String): Long = {
    val f = new java.io.File(s"$dir/$table.parquet")
    val files =
      if (f.isDirectory) f.listFiles().sortBy(_.getName) else Array(f)
    files.foldLeft(f.getPath.hashCode.toLong) { (acc, x) =>
      acc * 1000003L + x.getName.hashCode * 31L + x.length * 17L +
        x.lastModified
    }
  }

  /** The sweep every memo lookup runs before get/put: drop entries whose
    * SparkContext has stopped (their RDD blocks died with the context —
    * an identity-hash collision must rebuild, not serve a dead frame),
    * and drop entries for the CALLER's (session, dir) whose fingerprint
    * differs from the current one — after an in-place fixture
    * regeneration the old entry is unreachable by key, so removing the
    * map's strong reference lets the ContextCleaner reclaim its pinned
    * checkpoint blocks instead of holding them until session stop. */
  def sweep[V](
      memo: java.util.concurrent.ConcurrentHashMap[(Int, String, Long), V],
      session: V => org.apache.spark.sql.SparkSession,
      key: (Int, String, Long)): Unit = {
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val k = e.getKey
      if (session(e.getValue).sparkContext.isStopped ||
          (k._1 == key._1 && k._2 == key._2 && k._3 != key._3)) it.remove()
    }
  }
}
