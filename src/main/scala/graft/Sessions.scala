package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession construction path for every graft entry point
  * (Bench, Verify, the tools mains, specs via SparkSpec). Centralized
  * so the graft plan rules — [[graft.plans.SimplifyElementAtArray]] —
  * are installed EVERYWHERE: a session built without them explains and
  * profiles different plans than the benched/verified ones.
  */
object Sessions {

  /** Exact-IN parquet pushdown threshold, shared with every caller
    * that chunks id lists to stay under it (Indexes.
    * binaryTopKIndexedPoint) — one constant so lowering the session
    * threshold cannot silently degrade a chunk to an unpruned min/max
    * range filter. 1024 is measurement-backed in both directions
    * (see the .config scaladoc below) and leaves ~4× margin to the
    * ~4096-value StackOverflowError parquet-mr's nested Or tree hits
    * on a default 1 MB task stack — JVMs launched with a smaller
    * -Xss need a proportionally lower threshold.
    */
  val InFilterThreshold = 1024

  /** Local session with graft defaults: shuffle partitions = cores
    * (not Spark's 200 — local mode has `cores` slots), UTC, quiet
    * logs, plan rules installed.
    *
    * Shuffle partitioning is INPUT-SIZE-AWARE via AQE: shuffles start
    * at 8× the slot count and adaptive coalescing folds small ones
    * back to ~the advisory size, so a dimension-scale shuffle still
    * runs in `cores` tasks while a fact-scale one (600M-row keyed
    * fold at sf100) keeps enough partitions that per-task sorts fit
    * memory instead of spilling — the r13 q_rm_rbk attribution's
    * "spill-bound at 32 fixed partitions" profile (measured at sf100:
    * the 600M-row full-fact fold 438.6 s at 32 fixed partitions →
    * 168.7 s with this knob; the q1 scan control unchanged). Results
    * are
    * partitioning-independent by the repo's fold-order contracts
    * (DECIMAL sums, sort_array-pinned folds); the full oracle battery
    * re-verified after the change.
    */
  def local(cores: String =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cores.toInt * 8).toString)
      // Exact IN pushdown to parquet up to 1024 values: Spark's
      // default threshold (10) silently degrades a larger IN to a
      // min/max RANGE filter, which prunes nothing when the ids are
      // scattered — the id-keyed point-fetch shape (ANN shortlist
      // re-rank, media/winnow index probes) then re-reads the whole
      // corpus. Measured on a 20 GB id-clustered corpus, 1000
      // scattered ids: 55 s (range fallback, worse than the 12 s full
      // scan) → 5.7 s with exact IN (page/row-group stats pruning).
      // NOT higher: parquet-mr builds the IN as a recursively-nested
      // binary Or tree, and a ~4096-deep tree overflows a default
      // 1 MB task stack (StackOverflowError in the scan iterator —
      // hit by p_winnow_indexed's pushed fingerprint list at 4096).
      // Callers with bigger id lists chunk them (binaryTopKIndexed
      // Point) or pre-cap onto the semi-join path (winnow/media
      // probes' maxProbe* caps).
      .config("spark.sql.parquet.pushdown.inFilterThreshold",
        InFilterThreshold.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.SimplifyElementAtArray.install(spark)
    graft.plans.UnshredEav.install(spark)
    spark
  }
}
