package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      val bnl = plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct")
      val codegen = "WholeStageCodegen".r.findAllIn(plan).length
      println(s"PLAN $q shuffles=$shuffles nestedloop=$bnl codegenSpans=$codegen")
    }
    spark.stop()
  }
}
