package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crash injection for the [[Artifacts]] versioned-pointer lifecycle
  * (SeenSet and any rewrite-in-place artifact): a writer killed at
  * ANY of the lifecycle's intermediate states leaves the artifact
  * readable at its previous complete version. Each test materializes
  * one kill point by hand-constructing the on-disk state the crash
  * would leave.
  */
class CrashSafetySpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, pfx: String) =
    (0 until n).map(i => s"$pfx-$i").toDF("k")

  private def tmpArtifact(): String = java.nio.file.Files
    .createTempDirectory("graft-crash-").toString + "/filter"

  private def probeAll(pfx: String, n: Int, path: String): Long =
    graft.pipeline.SeenSet.probe(keys(n, pfx), "k",
        graft.pipeline.SeenSet.open(spark, path))
      .filter(!col("maybe_seen")).count()

  test("kill during next-version write: previous version stays live") {
    val path = tmpArtifact()
    graft.pipeline.SeenSet.write(keys(50, "a"), "k", path,
      mBits = 1024, nShards = 2)
    // the crash artifact: a half-written v00002 (directory exists,
    // contents are garbage — no parquet footer), pointer untouched
    val partial = new java.io.File(s"$path/v00002")
    assert(partial.mkdirs())
    java.nio.file.Files.write(partial.toPath.resolve("part-x.parquet"),
      Array[Byte](1, 2, 3))
    assert(Artifacts.currentVersion(spark, path).contains("v00001"))
    assert(probeAll("a", 50, path) == 0,
      "reader must resolve the pointer, never the partial directory")
    // recovery: the next append overwrites the orphan and commits
    graft.pipeline.SeenSet.appendTo(spark, keys(30, "b"), "k", path)
    assert(Artifacts.currentVersion(spark, path).contains("v00002"))
    assert(probeAll("a", 50, path) == 0 && probeAll("b", 30, path) == 0)
  }

  test("kill between version write and pointer swap: old version live") {
    val path = tmpArtifact()
    graft.pipeline.SeenSet.write(keys(50, "a"), "k", path,
      mBits = 1024, nShards = 2)
    // the crash artifact: v00002 fully written, pointer not swapped —
    // replay commit's first half verbatim
    val merged = graft.pipeline.SeenSet.append(keys(30, "b"), "k",
      graft.pipeline.SeenSet.open(spark, path))
    merged.write.mode("overwrite").parquet(s"$path/v00002")
    assert(Artifacts.currentVersion(spark, path).contains("v00001"))
    // the reader sees the PRE-append filter: complete and consistent
    assert(probeAll("a", 50, path) == 0)
    assert(graft.pipeline.SeenSet.open(spark, path)
      .agg(sum("n_keys")).head.getLong(0) == 50)
    // recovery: re-running the append lands; v00001 SURVIVES this
    // commit (the one-commit reader grace window the contract
    // promises) and is swept by the commit after
    graft.pipeline.SeenSet.appendTo(spark, keys(30, "b"), "k", path)
    assert(Artifacts.currentVersion(spark, path).contains("v00002"))
    assert(probeAll("b", 30, path) == 0)
    assert(new java.io.File(s"$path/v00001").exists(),
      "superseded version survives one commit (reader grace window)")
    assert(spark.read.parquet(s"$path/v00001").count() > 0,
      "a reader holding the superseded version can still finish its scan")
    graft.pipeline.SeenSet.appendTo(spark, keys(10, "c"), "k", path)
    assert(Artifacts.currentVersion(spark, path).contains("v00003"))
    assert(!new java.io.File(s"$path/v00001").exists(),
      "the commit AFTER next prunes the superseded version")
    assert(new java.io.File(s"$path/v00002").exists())
  }

  test("kill between pointer swap and prune: new version live, stale dir swept") {
    val path = tmpArtifact()
    graft.pipeline.SeenSet.write(keys(50, "a"), "k", path,
      mBits = 1024, nShards = 2)
    graft.pipeline.SeenSet.appendTo(spark, keys(30, "b"), "k", path)
    // the crash artifact: clobber the grace-window v00001 with junk
    // (equivalent to a crashed writer's garbage below the pointer)
    graft.pipeline.SeenSet.build(keys(1, "junk"), "k", mBits = 1024)
      .write.mode("overwrite").parquet(s"$path/v00001")
    assert(Artifacts.currentVersion(spark, path).contains("v00002"))
    assert(probeAll("a", 50, path) == 0 && probeAll("b", 30, path) == 0,
      "pointer wins over stale directories")
    // each commit sweeps everything strictly below the version it
    // supersedes: v00003 sweeps v00001, v00004 sweeps v00002
    graft.pipeline.SeenSet.appendTo(spark, keys(10, "c"), "k", path)
    assert(!new java.io.File(s"$path/v00001").exists())
    assert(new java.io.File(s"$path/v00002").exists(),
      "grace window: v00002 outlives the commit that superseded it")
    assert(Artifacts.currentVersion(spark, path).contains("v00003"))
    graft.pipeline.SeenSet.appendTo(spark, keys(10, "d"), "k", path)
    assert(!new java.io.File(s"$path/v00002").exists())
    assert(Artifacts.currentVersion(spark, path).contains("v00004"))
  }

  test("orphaned pointer-tmp and stale flat files swept on EVERY commit") {
    val path = tmpArtifact()
    graft.pipeline.SeenSet.write(keys(50, "a"), "k", path,
      mBits = 1024, nShards = 2)
    // crash artifact 1: a writer killed between fs.create(tmp) and
    // the pointer rename leaves ._CURRENT.tmp-<uuid> at the root
    val orphanTmp = new java.io.File(path,
      s".${Artifacts.Pointer}.tmp-dead-beef")
    java.nio.file.Files.write(orphanTmp.toPath,
      "v99999".getBytes("UTF-8"))
    // crash artifact 2: a migration commit killed between the pointer
    // swap and its flat-file sweep leaves stale pre-versioning
    // part-files at the root
    val staleFlat = new java.io.File(path, "part-00000-stale.parquet")
    java.nio.file.Files.write(staleFlat.toPath, Array[Byte](9, 9))
    // neither confuses a reader (the pointer wins)...
    assert(Artifacts.currentVersion(spark, path).contains("v00001"))
    assert(probeAll("a", 50, path) == 0)
    // ...and the NEXT commit — any commit, not just a migration —
    // sweeps both litter classes instead of accumulating them forever
    graft.pipeline.SeenSet.appendTo(spark, keys(10, "b"), "k", path)
    assert(!orphanTmp.exists(),
      "commit must sweep orphaned pointer-tmp files")
    assert(!staleFlat.exists(),
      "commit must sweep stale flat part-files on every run")
    assert(probeAll("a", 50, path) == 0 && probeAll("b", 10, path) == 0)
  }

  test("killed appendBinaryIndex leaves the index probe-consistent") {
    // the append families ride the Parquet committer (v1: task output
    // lands under _temporary and becomes visible only at JOB commit)
    // plus the documented single-writer contract. This materializes
    // the kill-point state by hand, like the pointer-lifecycle tests
    // above: a job killed mid-append leaves _temporary litter and
    // hidden tmp files but NO visible partial rows.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-crash-").toString + "/binidx"
    val emb = graft.Tables.embeddings(spark, sf())
    val base = emb.filter(col("vec_id") % 10 =!= 3)
    val batch = emb.filter(col("vec_id") % 10 === 3)
    graft.pipeline.Indexes.writeBinaryIndex(base, "vec_id",
      "embedding", dir)
    val queries = emb.orderBy("vec_id").limit(5)
    def probe(path: String): Seq[(Long, Int, Long)] =
      graft.pipeline.Indexes.binaryTopKIndexed(queries,
          graft.pipeline.Indexes.openBinaryIndex(spark, path), emb,
          "vec_id", "vec_id", "embedding", k = 3, shortlist = 50)
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val before = probe(dir)
    // crash artifact: a mid-append kill — committer work dir with a
    // partial (garbage) task file, plus a hidden .tmp at the root
    val tmpDir = new java.io.File(dir,
      "_temporary/0/_temporary/attempt_dead_0001_m_000000_0")
    assert(tmpDir.mkdirs())
    java.nio.file.Files.write(
      tmpDir.toPath.resolve("part-00000-dead.snappy.parquet"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir,
      ".part-00001-dead.snappy.parquet.crc"), Array[Byte](7))
    assert(probe(dir) == before,
      "in-flight committer litter must be invisible to the probe")
    // recovery: re-running the append lands next to the base files;
    // the probe now matches a from-scratch rebuild over base ∪ batch
    graft.pipeline.Indexes.appendBinaryIndex(batch, "vec_id",
      "embedding", dir)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-crash-").toString + "/binidx2"
    graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
      "embedding", rebuilt)
    assert(probe(dir) == probe(rebuilt),
      "append after a killed append must equal the rebuild")
  }

  test("killed appendWinnowIndex leaves the index probe-consistent") {
    // second append family under the kill-point discipline (r14;
    // appendBinaryIndex above was r13): same Parquet-committer
    // visibility argument, different artifact shape (sparse (id, h)
    // fingerprint rows, h-sorted base + unsorted appended row groups
    // — sortedness is a pruning LAYOUT hint, not a correctness
    // invariant, so append-after-kill must still equal a rebuild).
    val dir = java.nio.file.Files
      .createTempDirectory("graft-crash-").toString + "/winidx"
    val doc = graft.Tables.documents(spark, sf())
    val base = doc.filter(col("doc_id") % 10 =!= 3)
    val batch = doc.filter(col("doc_id") % 10 === 3)
    graft.pipeline.Indexes.writeWinnowIndex(base, "doc_id", "text", dir)
    val probeBatch = doc.filter(col("doc_id") % 7 === 0)
    def probe(path: String): Seq[(Long, Long, Long)] =
      graft.pipeline.Indexes.winnowCandidatesIndexed(probeBatch,
          "doc_id", "text",
          graft.pipeline.Indexes.openWinnowIndex(spark, path))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val before = probe(dir)
    // crash artifact: a mid-append kill — committer work dir with a
    // partial (garbage) task file, plus a hidden .tmp at the root
    val tmpDir = new java.io.File(dir,
      "_temporary/0/_temporary/attempt_dead_0001_m_000000_0")
    assert(tmpDir.mkdirs())
    java.nio.file.Files.write(
      tmpDir.toPath.resolve("part-00000-dead.snappy.parquet"),
      Array[Byte](1, 2, 3))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir,
      ".part-00001-dead.snappy.parquet.crc"), Array[Byte](7))
    assert(probe(dir) == before,
      "in-flight committer litter must be invisible to the probe")
    // recovery: re-running the append lands next to the base files;
    // the probe now matches a from-scratch rebuild over base ∪ batch
    graft.pipeline.Indexes.appendWinnowIndex(batch, "doc_id", "text",
      dir)
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-crash-").toString + "/winidx2"
    graft.pipeline.Indexes.writeWinnowIndex(doc, "doc_id", "text",
      rebuilt)
    assert(probe(dir) == probe(rebuilt),
      "append after a killed append must equal the rebuild")
  }

  test("pre-versioning flat artifacts still open (legacy fallback)") {
    val path = tmpArtifact()
    graft.pipeline.SeenSet.build(keys(20, "a"), "k", mBits = 1024)
      .write.mode("overwrite").parquet(path)
    assert(Artifacts.currentVersion(spark, path).isEmpty)
    assert(probeAll("a", 20, path) == 0)
    // and the first appendTo MIGRATES it to the versioned layout,
    // sweeping the now-stale flat part-files from the root so an
    // external plain spark.read.parquet(path) can't silently read
    // the pre-append filter forever
    graft.pipeline.SeenSet.appendTo(spark, keys(5, "b"), "k", path)
    assert(Artifacts.currentVersion(spark, path).contains("v00001"))
    assert(probeAll("a", 20, path) == 0 && probeAll("b", 5, path) == 0)
    // only the pointer (and local-FS checksum sidecars, dot-prefixed)
    // may remain at the root — no part-* / _SUCCESS data files
    val rootFiles = new java.io.File(path).listFiles().toSeq
      .filter(_.isFile).map(_.getName)
      .filterNot(n => n.startsWith(".") || n == Artifacts.Pointer)
    assert(rootFiles.isEmpty,
      s"migration must sweep legacy flat files, found: $rootFiles")
  }
}
