package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standalone measurement probes used while producing BENCH/BASELINE.md.
  * Env: HT_CPUS (local[N] + shuffle partitions), HT_ROWS (synthetic rows).
  */
object Probes {
  def session(): SparkSession = {
    val cpus = sys.env.getOrElse("HT_CPUS", "8")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  def cpus: Int = sys.env.getOrElse("HT_CPUS", "8").toInt
  def rows: Long = sys.env.getOrElse("HT_ROWS", "1280000000").toLong
}

/** Headline pipeline probe: PIP join + tile rasterization over the
  * synthetic pages table, 2 runs (cold + warm). */
object HeadlineProbe {
  def main(a: Array[String]): Unit = {
    val spark = Probes.session()
    for (i <- 1 to 2) {
      def pages = graft.sources.Pages.synthetic(spark, Probes.rows, Probes.cpus * 4)
        .select("doc_id", "ts_sec", "ilat", "ilon")
      val t0 = System.nanoTime()
      val j = graft.operators.GeoQueries.pipJoinTimelessOn(spark, pages).count()
      val t1 = System.nanoTime()
      val t = graft.operators.Tiling.rasterizeLongOn(spark, pages).count()
      val t2 = System.nanoTime()
      println(f"run$i cpus=${Probes.cpus} rows=${Probes.rows} join=$j joinSec=${(t1 - t0) / 1e9}%.2f " +
        f"tile=$t tileSec=${(t2 - t1) / 1e9}%.2f rate=${(j + t) / ((t2 - t0) / 1e9)}%.0f")
    }
    spark.stop()
  }
}

/** Skew probe: partitioned (shuffle) PIP join with and without salting over
  * the synthetic pages table (10% of rows in ONE cell) — evidence for the
  * explicit-skew-handling claim. HT_AQE=0 disables adaptive skew splitting
  * to isolate the salting effect. */
object SkewProbe {
  def main(a: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("HT_CPUS", "8")
    val aqe = sys.env.getOrElse("HT_AQE", "1") == "1"
    val spark = org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def pages = graft.sources.Pages.synthetic(spark, Probes.rows, Probes.cpus * 4)
      .select("doc_id", "ts_sec", "ilat", "ilon", "lang", "source")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val plain = graft.operators.GeoQueries
        .partitionedPipOn(spark, pages, widenTime = true).count()
      val t1 = System.nanoTime()
      val salted = graft.operators.GeoQueries
        .saltedPipJoinOn(spark, pages, widenTime = true).count()
      val t2 = System.nanoTime()
      println(f"run$i aqe=$aqe plainRows=$plain plainSec=${(t1 - t0) / 1e9}%.2f " +
        f"saltedRows=$salted saltedSec=${(t2 - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
