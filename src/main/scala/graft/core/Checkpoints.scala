package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage barrier for iterative operators (connected components,
  * PageRank, label propagation, MMR's greedy union) with a
  * RELIABILITY KNOB.
  *
  * Every fixed-point loop here must cut lineage per round — without a
  * barrier the plan doubles every iteration and Catalyst re-analyzes
  * an exponentially growing tree. Two ways to cut it:
  *
  *  - `localCheckpoint()` (the DEFAULT): blocks live on executor
  *    block managers. Fast — no filesystem round-trip — and exactly
  *    right on local[*] and for short interactive jobs. The cost is
  *    fault tolerance: the blocks are the ONLY copy (lineage is
  *    truncated), so one lost executor kills the job mid-iteration.
  *    Acceptable when losing the job just means re-running it;
  *    not acceptable for a 12-hour 1000-executor CC pass.
  *  - reliable `checkpoint()`: set `spark.graft.checkpoint.dir` to a
  *    durable path (HDFS/object store) and every barrier writes its
  *    round frame there instead. An executor loss now recomputes the
  *    lost partitions from the checkpoint files — the iteration
  *    SURVIVES. Results are identical in both modes
  *    (CheckpointModeSpec pins dupGroups/pageRank equality); the only
  *    difference is where the barrier's bytes live.
  *
  * Operational notes for the reliable mode: the directory must be
  * reachable from every executor; files accumulate for the
  * SparkContext lifetime unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (Spark's
  * own GC-driven reaper) or the caller prunes the directory between
  * jobs. [[Caches.releaseAll]] still sweeps the block-manager side
  * (local mode); reliable checkpoint files are the caller's to
  * manage, like any other artifact directory.
  */
object Checkpoints {
  /** Session conf key: when set (non-empty), iterative barriers use
    * reliable `checkpoint()` into this directory; when unset, fast
    * executor-local `localCheckpoint()`.
    */
  val DirConf = "spark.graft.checkpoint.dir"

  // setCheckpointDir mints a fresh UUID subdirectory per call, so the
  // context's resolved dir never string-equals the conf value — track
  // the last conf value applied instead of re-setting per barrier
  // (which would scatter each round into its own subdirectory). The
  // guard is keyed on the SparkContext AND re-checks the context's
  // own dir: a JVM-global string alone would outlive a context
  // restart (test suites, notebook session recreation) and the new
  // context would throw "checkpoint directory has not been set".
  private var appliedDir: Option[(org.apache.spark.SparkContext,
    String)] = None

  /** Cut `df`'s lineage with the mode the session conf selects; the
    * barrier is eager in both modes (the round's work runs HERE, not
    * at first downstream use — what every fixed-point loop wants).
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        synchronized {
          if (sc.getCheckpointDir.isEmpty ||
              !appliedDir.contains((sc, dir))) {
            sc.setCheckpointDir(dir)
            appliedDir = Some((sc, dir))
          }
        }
        // reliable checkpoint() writes its files in a SEPARATE job
        // that recomputes the RDD — persist first so each round is
        // computed once, not twice, then drop the blocks (the
        // checkpoint files are now the round's source of truth).
        // Skip when the caller already cached an equivalent plan:
        // unpersisting here would silently drop THEIR cache (the
        // CacheManager matches by analyzed plan, not reference).
        val fresh =
          df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
        if (fresh) df.persist()
        try df.checkpoint()
        finally if (fresh) df.unpersist()
      case None => df.localCheckpoint()
    }
  }
}
