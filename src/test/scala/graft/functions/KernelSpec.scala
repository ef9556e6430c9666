package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.testutil.{Checks, SparkTestBase}

/** GraftKernels.shingleHashes must equal the Column-chain definition
  * (split / slice / concat_ws / md5 / conv) bit-for-bit on arbitrary
  * text — including unicode, repeated spaces (empty tokens), and
  * sub-3-token degenerates. */
class KernelSpec extends SparkTestBase with Checks {
  import spark.implicits._

  override protected def cases: Int = 8 // each case checks a 40-string batch

  private val genToken = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf("käse", "naïve", "中文", "a b", "", " ", "🌍", "x'y\"z"))
  private val genText = for {
    n <- Gen.choose(0, 12)
    ts <- Gen.listOfN(n, genToken)
  } yield ts.mkString(" ")

  test("shingle_hashes == split/concat_ws/md5/conv chain on arbitrary text") {
    GraftFunctions.register(spark)
    forAll(Gen.listOfN(40, genText)) { texts =>
      val df = texts.toDF("text").persist()
      val toks = split(col("text"), " ")
      val chain = df
        .withColumn("n_tok", size(toks))
        .withColumn("want",
          when(col("n_tok") >= 3,
            transform(sequence(lit(0), col("n_tok") - 3),
              j => conv(substring(md5(concat_ws(" ", slice(toks, j + 1, lit(3)))), 1, 15), 16, 10)
                .cast("long")))
            .otherwise(array().cast("array<long>")))
        .withColumn("got", GraftFunctions.shingle_hashes(col("text")))
      val bad = chain.filter(col("want") =!= col("got")).collect()
      df.unpersist(false)
      assert(bad.isEmpty, s"mismatch on: ${bad.map(_.getString(0)).take(3).toSeq}")
    }
  }
}
