package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Checkpoints]]' contract: the reliable `checkpoint()` mode
  * (selected by `spark.graft.checkpoint.dir`) and the default
  * `localCheckpoint()` mode produce IDENTICAL results for the
  * iterative operators routed through [[Checkpoints.cut]] — the only
  * difference is where the barrier's bytes live. Referenced by
  * Checkpoints.scala, Dedup.dupGroups, LinkGraph.pagerank.
  */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try body
    finally {
      spark.conf.unset(Checkpoints.DirConf)
      // reliable checkpoint files are the caller's to manage
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }

  // two chains (1-2-3-4, 10-11) + isolated node 20: exercises the
  // pointer-doubling rounds and the singleton left join
  private def ids = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L))
    .toDF("doc_id")
  private def pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    .toDF("id1", "id2")

  test("dupGroups: reliable checkpoint mode matches localCheckpoint") {
    val local = graft.pipeline.Dedup
      .dupGroups(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().sorted
    val reliable = withReliable {
      graft.pipeline.Dedup.dupGroups(ids, "doc_id", pairs)
        .as[(Long, Long)].collect().sorted
    }
    assert(reliable.sameElements(local), reliable.mkString(","))
    assert(local.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("pagerank: reliable checkpoint mode matches localCheckpoint") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (1L, 3L, 2L), (4L, 1L, 1L)).toDF("src", "dst", "w")
    val local = graft.pipeline.LinkGraph.pagerank(edges, iters = 5)
      .as[(Long, Long)].collect().sorted
    val reliable = withReliable {
      graft.pipeline.LinkGraph.pagerank(edges, iters = 5)
        .as[(Long, Long)].collect().sorted
    }
    assert(reliable.sameElements(local),
      s"fixed-point ranks must be bit-identical across modes:\n" +
        s"  local:    ${local.mkString(",")}\n" +
        s"  reliable: ${reliable.mkString(",")}")
  }

  test("reliable mode actually writes checkpoint files to the dir") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-ckpt-").toString
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val cut = Checkpoints.cut(Seq(1, 2, 3).toDF("x"))
      assert(cut.as[Int].collect().sorted.sameElements(Array(1, 2, 3)))
      def filesUnder(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory)
          .flatMap(filesUnder)
      }
      assert(filesUnder(new java.io.File(dir)).nonEmpty,
        "checkpoint() must have materialized files under the conf dir")
    } finally {
      spark.conf.unset(Checkpoints.DirConf)
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(dir))
    }
  }
}
