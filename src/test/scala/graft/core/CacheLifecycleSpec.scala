package graft.core

import graft.{SparkSpec, SparkEntry}

/** Pins the cache-lifecycle contract: operators stage persists through
  * [[Caches]], and after a gate query's consuming action plus the
  * harness release, the session holds ZERO pinned blocks — so no query
  * (bench, verify, or a long-lived cluster session) pays for another
  * query's caches. Covers every operator family that stages frames:
  * minhash bucket self-joins (p_minhash), simhash fps (p_simhash),
  * curation prefix (p_curate), deep express templates
  * (q_express_deep), the CC loop's persists + localCheckpoints
  * (p_dup_groups), and the text-bridge facts cache (q_rm_mixed).
  */
class CacheLifecycleSpec extends SparkSpec {

  private val staged = Seq("p_minhash", "p_simhash", "p_curate",
    "q_express_deep", "p_dup_groups", "q_rm_mixed", "p_incr_dedup",
    "p_keywords", "p_bm25", "p_cms", "p_postings", "p_dup_spans",
    // round 8: profiler value-count frame, heavy-hitter tokenized
    // frame, pagerank edge frame + per-pass localCheckpoints
    "p_profile", "p_heavy", "p_pagerank")

  for (name <- staged)
    test(s"$name leaves no pinned blocks after release") {
      SparkEntry.queries(name)(spark, sf()).count()
      Caches.releaseAll(spark)
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name left pinned RDDs after Caches.releaseAll: " +
          spark.sparkContext.getPersistentRDDs.values
            .map(_.toString).mkString("; "))
    }

  test("releaseAll is idempotent and safe on an empty session") {
    Caches.releaseAll(spark)
    Caches.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("stage returns a usable persisted frame and release drops it") {
    import spark.implicits._
    val df = Caches.stage(Seq(1, 2, 3).toDF("x"))
    assert(df.count() == 3)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Caches.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // persist-backed (lineage intact) frames stay computable
    assert(df.count() == 3)
  }
}
