package graft

import org.apache.spark.sql.SparkSession

/** The one SparkSession construction path for every graft entry point
  * (Bench, Verify, the tools mains, specs via SparkSpec). Centralized
  * so the graft plan rules — [[graft.plans.SimplifyElementAtArray]] —
  * are installed EVERYWHERE: a session built without them explains and
  * profiles different plans than the benched/verified ones.
  */
object Sessions {

  /** Local session with graft defaults: shuffle partitions = cores
    * (not Spark's 200 — local mode has `cores` slots), UTC, quiet
    * logs, plan rules installed.
    */
  def local(cores: String =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.SimplifyElementAtArray.install(spark)
    graft.plans.UnshredEav.install(spark)
    spark
  }
}
