package graft.operators

import org.apache.spark.sql.functions._
import graft.testutil.SparkTestBase

class TextOpsSpec extends SparkTestBase {

  test("minhash: identical texts get identical signatures") {
    import spark.implicits._
    val sigs = TextQueries.minhashSigs(spark, sf001)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .withColumn("h", md5(col("text")))
    val joined = sigs.join(docs.select("doc_id", "h"), "doc_id")
    // group by content hash: every group must have exactly 1 distinct sig tuple
    val bad = joined.groupBy("h")
      .agg(countDistinct(struct((0 until 8).map(i => col(s"s$i")): _*)).as("nsig"))
      .filter($"nsig" > 1).count()
    assert(bad === 0)
  }

  test("lsh near-dup pairs all have jaccard >= threshold and exact dups are found (sf0.1)") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.1"
    val pairs = TextQueries.lshNearDupPairs(spark, sf01).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getLong(2) >= 200))
    // exact duplicate texts (they exist at sf0.1) must surface with jac == 1000
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
    val dupPairs = docs.as("a").join(docs.as("b"),
        $"a.text" === $"b.text" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = pairs.filter(_.getLong(2) === 1000L)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.subsetOf(found), s"missing exact dups: ${dupPairs -- found}")
  }

  test("simhash: exact-dup docs have identical simhash") {
    import spark.implicits._
    val sf01 = "/root/testdata/sf0.1"
    val sh = TextQueries.simhash(spark, sf01)
    val docs = spark.read.parquet(s"$sf01/documents.parquet")
      .filter($"doc_id" < 200).withColumn("h", md5($"text"))
    val bad = sh.join(docs.select("doc_id", "h"), "doc_id")
      .groupBy("h").agg(countDistinct($"simhash16").as("n"))
      .filter($"n" > 1).count()
    assert(bad === 0)
  }

  test("fingerprint distinguishes at least as well as md5 within sample") {
    // n_fp <= n_docs and fingerprint collisions only where md5 collides (modulo 1e9+7 collisions, none expected here)
    val fp = TextQueries.fingerprint(spark, sf001).collect()
    for (r <- fp) assert(r.getLong(2) <= r.getLong(1))
  }
}
