package graft.util

import org.apache.spark.sql.SparkSession

/** Single source of truth for the engine's session configuration (Bench,
  * CLI, any future main). Verify.scala keeps its own driver-authored
  * builder — that file is the harness contract and stays untouched. */
object GraftSession {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // under spark-submit the master comes from the launcher; default local
    val s = (if (sys.props.contains("spark.master")) b else b.master(s"local[$cpus]"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
