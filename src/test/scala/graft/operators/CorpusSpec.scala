package graft.operators

import org.apache.spark.sql.functions._

import graft.testutil.SparkTestBase

/** Semantic laws for the corpus-shaping operators (q77–q80) that the
  * row-equality oracle can't see. */
class CorpusSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("q77 packing: bucket-size invariance proves the distributed prefix sum exact") {
    // the three-stage distributed prefix sum must give THE SAME shards for
    // any bucket decomposition — the law that pins stage-2/3 correctness
    val a = CorpusQueries.shardPacking(spark, sf001, bucket = 100)
      .collect().map(_.toSeq).toSeq
    val b = CorpusQueries.shardPacking(spark, sf001, bucket = 7)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("q77 packing: shards are contiguous doc ranges covering every token once") {
    val rows = CorpusQueries.shardPacking(spark, sf001).orderBy("shard").collect()
    val totalTok = docs.select(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum === totalTok, "every token packed exactly once")
    // doc ranges of consecutive shards are contiguous and non-overlapping
    rows.sliding(2).foreach {
      case Array(x, y) => assert(y.getLong(3) === x.getLong(4) + 1,
        s"shard ${y.getLong(0)} does not start right after ${x.getLong(0)}")
      case _ => ()
    }
    // straddle convention: every shard but the last holds >= shardTokens
    // of STARTING offsets, so each spans >= 1 doc and counts are positive
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q78 decontamination: benchmark excluded; threshold monotone") {
    val at5 = CorpusQueries.decontaminate(spark, sf001, minShared = 5).collect()
    val nDocs = at5.map(_.getLong(1)).sum
    val expected = docs.filter(col("doc_id") % 97 =!= 0).count()
    assert(nDocs === expected, "corpus side must exclude the benchmark docs")
    val at1 = CorpusQueries.decontaminate(spark, sf001, minShared = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    at5.foreach { r =>
      assert(at1(r.getString(0)) >= r.getLong(2),
        s"lowering the threshold must not lower n_contam for ${r.getString(0)}")
    }
    // with the 32-word vocab, 3-gram overlap against ~5 benchmark docs is
    // real — the operator must actually fire at minShared=1
    assert(at1.values.sum > 0, "decontamination never fired — fixture broken")
  }

  test("q79 scrub: planted counts exact and nothing survives the scrub") {
    val out = CorpusQueries.piiScrub(spark, sf001).collect()
    val nEmail = out.map(_.getLong(2)).sum
    val nPhone = out.map(_.getLong(3)).sum
    assert(nEmail === docs.filter(col("doc_id") % 7 === 0).count())
    assert(nPhone === docs.filter(col("doc_id") % 11 === 0).count())
    // law the aggregate can't see: zero residual PII after the scrub
    val planted = docs.withColumn("text2", concat(col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" call 555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0")))
        .otherwise(lit(""))))
    val residual = planted.withColumn("scrubbed", regexp_replace(regexp_replace(
        col("text2"), "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "[0-9]{3}-[0-9]{4,6}", "<PHONE>"))
      .select(sum(regexp_count(col("scrubbed"),
        lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")) +
        regexp_count(col("scrubbed"), lit("[0-9]{3}-[0-9]{4,6}"))))
      .head.getLong(0)
    assert(residual === 0L)
  }

  test("q86 pipeline: composition equals the independently-applied stages") {
    import org.apache.spark.sql.expressions.Window
    val out = CorpusQueries.corpusPipeline(spark, sf001).collect()
    // recompute the survivor set stage by stage with independent code
    val d = docs.withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
      .filter(col("n_tok").between(5, 10000) && col("n_chars") < 100000 &&
        col("lang").isin("en", "de", "fr"))
    val dedup = d.withColumn("rk",
        row_number().over(Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
    val contam = CorpusQueries.decontaminate(spark, sf001, minShared = 1) // warm-up only
    assert(contam.count() > 0)
    val survivors = dedup.filter(col("doc_id") % 97 =!= 0)
      .join(CorpusQueries.contaminatedDocIds(spark, sf001, CorpusQueries.ContamShared),
        Seq("doc_id"), "left_anti")
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rnk") <= CorpusQueries.DomainCap)
    // conservation: every survivor packed exactly once
    assert(out.map(_.getLong(1)).sum === survivors.count())
    assert(out.map(_.getLong(2)).sum ===
      survivors.agg(sum(col("n_tok"))).head.getLong(0))
    graft.util.CacheBag.release()
  }

  test("q80 domain cap: kept = min(cap, domain size), and keeps the largest") {
    val out = CorpusQueries.domainCap(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    val sizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (src, kept, minKept) =>
      assert(kept === math.min(CorpusQueries.DomainCap.toLong, sizes(src)))
      // every excluded doc is <= the smallest kept one (cap keeps the top)
      if (sizes(src) > CorpusQueries.DomainCap) {
        val nBigger = docs.filter(col("source") === src && col("n_chars") > minKept).count()
        assert(nBigger <= CorpusQueries.DomainCap.toLong)
      }
    }
  }
}
