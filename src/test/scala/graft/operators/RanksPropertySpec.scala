package graft.operators

import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** Property layer for the shared distributed rank (q108/q133/q142's
  * engine): on seeded random inputs of varying shape — duplicates, skew,
  * single row, fewer rows than partitions — the 3-stage rank must equal
  * the single-window row_number bit-exactly. */
class RanksPropertySpec extends SparkTestBase {
  import spark.implicits._

  test("Ranks.distributed == single-window row_number on seeded random inputs") {
    val rng = new scala.util.Random(0xC0FFEE)
    for (trial <- 0 until 6) {
      val n = Seq(1, 3, 17, 200, 1000, 4096)(trial)
      // values skew heavily (Zipf-ish) so range partitions see duplicates
      // across boundaries; the id column makes the sort key unique
      val rows = (0 until n).map { i =>
        (i.toLong, math.abs(rng.nextInt(math.max(2, n / 10))).toLong)
      }
      val df = rows.toDF("id", "v")
      val got = Ranks.distributed(df, col("v").desc, col("id"))
        .select(col("id"), col("rnk")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      graft.util.CacheBag.release()
      val want = rows.sortBy { case (id, v) => (-v, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      assert(got === want, s"trial $trial (n=$n) diverged")
    }
  }
}
