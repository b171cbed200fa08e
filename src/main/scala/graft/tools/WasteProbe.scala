package graft.tools
object WasteProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (cap <- Seq(80, 100, 128, 256); w <- Seq(32)) {
      def waste(bySize: Boolean): Double =
        graft.pipeline.TextFns.packingStats(
          graft.pipeline.TextFns.assembleBatchesStrict(
            d, "doc_id", "text", w, cap, 8, bySize), cap)
          .select("waste_frac").head().getDouble(0)
      println(f"cap=$cap%4d window=$w: doc-order ${waste(false)}%.4f  size-sorted ${waste(true)}%.4f")
    }
    spark.stop()
  }
}
