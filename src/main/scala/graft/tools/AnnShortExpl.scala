// Scratch: explain the binary-index shortlist plan — is the rank<=k
// filter rewritten to WindowGroupLimit (map-side top-k before the
// exchange), or does the full |index|×|queries| join output sort/spill
// through the window?
//   tools/run_main.sh graft.tools.AnnShortExpl /root/testdata/sf0.01
package graft.tools

object AnnShortExpl {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Sessions.local("8")
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val path = "/tmp/graft_annexpl_idx"
    graft.pipeline.Indexes.writeBinaryIndex(emb, "vec_id",
      "embedding", path)
    val qs = emb.orderBy("vec_id").limit(20)
    val out = graft.pipeline.Indexes.binaryTopKIndexed(qs,
      graft.pipeline.Indexes.openBinaryIndex(spark, path), emb,
      "vec_id", "vec_id", "embedding", k = 5, shortlist = 50)
    out.write.mode("overwrite").format("noop").save()
    println(out.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
