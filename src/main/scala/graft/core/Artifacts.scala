package graft.core

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe lifecycle for small persisted artifacts that are
  * REWRITTEN in place (Bloom seen-sets, any merge-on-append frame):
  * versioned subdirectories plus an atomically-swapped pointer file,
  * so a reader NEVER observes a half-written or deleted artifact.
  *
  * Layout under the artifact root `path/`:
  * {{{
  *   path/_CURRENT      one line naming the live version ("v00002")
  *   path/v00001/       a complete parquet frame (superseded)
  *   path/v00002/       a complete parquet frame (live)
  * }}}
  *
  * [[commit]] writes the WHOLE new frame to the next version
  * directory first, then swaps `_CURRENT` via temp-file + rename —
  * the one filesystem operation that is atomic on POSIX and
  * single-file-atomic on HDFS-compatible stores (FileContext rename
  * with OVERWRITE) — and only then prunes superseded versions. A
  * crash at ANY point leaves `_CURRENT` naming a complete frame:
  *
  *  - during the version write: pointer still names the old version;
  *    the partial directory is invisible (next commit overwrites it —
  *    version numbering restarts from the pointer, not from what's
  *    on disk);
  *  - between version write and pointer swap: same;
  *  - between pointer swap and prune: the new version is live; the
  *    stale directory is garbage a later [[commit]] sweeps (each
  *    commit prunes every `v*` strictly below the version it
  *    supersedes, so a version survives exactly one commit past
  *    being superseded).
  *
  * Concurrency contract (the same one every persisted index here
  * carries): SINGLE WRITER per artifact — commits are not serialized
  * against each other, and two concurrent writers can both read
  * version N and each write an N+1. Readers need no coordination:
  * [[open]] resolves the pointer once and reads an immutable
  * directory; a reader holding version N while a commit promotes
  * N+1 is safe until the commit AFTER next prunes N — re-open per
  * batch, which every gate and operator here does.
  *
  * Object stores without atomic single-object rename (plain S3)
  * need the usual vendor committer / consistent-pointer story; the
  * seam is this one file.
  *
  * The artifact root is EXCLUSIVELY OWNED by this lifecycle: every
  * [[commit]] deletes any root-level file other than `_CURRENT`
  * (orphaned `._CURRENT.tmp-*` from a killed writer, stale
  * pre-versioning part-files) and any superseded `v*` directory.
  * Do not park unrelated files (READMEs, markers) at the root —
  * give the artifact its own directory.
  */
object Artifacts {
  val Pointer = "_CURRENT"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The live version name, if `path` is a versioned artifact. */
  def currentVersion(spark: SparkSession,
      path: String): Option[String] = {
    val ptr = new Path(path, Pointer)
    val fs = fsOf(spark, ptr)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  /** Read the live frame. Falls back to reading `path` directly so
    * pre-versioning flat artifacts stay openable.
    */
  def open(spark: SparkSession, path: String): DataFrame =
    currentVersion(spark, path) match {
      case Some(v) => spark.read.parquet(s"$path/$v")
      case None    => spark.read.parquet(path)
    }

  /** Publish `df` as the artifact's next version: full write, atomic
    * pointer swap, prune. `df` may read FROM the artifact's live
    * version (the append-merge shape) — the write lands in a
    * different directory, so the input is never clobbered mid-scan.
    */
  def commit(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val cur = currentVersion(spark, path)
    val curN = cur.map(_.stripPrefix("v").toInt).getOrElse(0)
    val next = f"v${curN + 1}%05d"
    df.write.mode("overwrite").parquet(s"$path/$next")
    swapPointer(spark, path, next)
    val root = new Path(path)
    val fs = fsOf(spark, root)
    // prune AFTER the swap, keeping the version we just superseded:
    // a reader that resolved the pointer to vN before this commit
    // promoted vN+1 keeps a readable directory for one more commit
    // (the grace window the contract above promises).
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory) {
        if (n.startsWith("v") && n != next &&
            n.drop(1).forall(_.isDigit) &&
            n.drop(1).toInt < curN)
          fs.delete(st.getPath, true)
      } else if (n != Pointer) {
        // EVERY commit sweeps non-pointer root files, not just the
        // migration commit: a writer killed between fs.create(tmp)
        // and the pointer rename orphans a `._CURRENT.tmp-<uuid>`
        // forever, and a crash between the migration pointer swap
        // and its flat-file sweep leaves stale pre-versioning
        // part-files that a direct spark.read.parquet(path) would
        // silently prefer. Under the single-writer contract no live
        // tmp file can belong to anyone else, and a versioned root
        // legitimately holds only the pointer and v* directories.
        fs.delete(st.getPath, false)
      }
    }
  }

  private def swapPointer(spark: SparkSession, path: String,
      version: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = fsOf(spark, root)
    val qualified = fs.makeQualified(root)
    val tmp = new Path(qualified,
      s".$Pointer.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8"))
    finally out.close()
    val fc = FileContext.getFileContext(qualified.toUri, conf)
    fc.rename(tmp, new Path(qualified, Pointer),
      Options.Rename.OVERWRITE)
  }
}
