package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.testutil.SparkTestBase

class FormatsSpec extends SparkTestBase {

  private def digest(df: org.apache.spark.sql.DataFrame) = df
    .select(col("doc_id"), col("url"), col("ts_sec"),
      md5(col("html")).as("hm"), col("text"), col("lang"), col("source"),
      col("n_chars"), col("ilat"), col("ilon"))
    .orderBy("doc_id").collect().map(_.toSeq).toSeq

  test("jsonl round-trip preserves every column including html bytes") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val pages = Pages.fromDocuments(spark, sf0001)
    Formats.writeJsonl(pages, dir)
    assert(digest(Formats.readJsonl(spark, dir)) === digest(pages))
  }

  test("csv round-trip preserves every column including html bytes") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val pages = Pages.fromDocuments(spark, sf0001)
    Formats.writeCsv(pages, dir)
    assert(digest(Formats.readCsv(spark, dir)) === digest(pages))
  }

  test("csv round-trip keeps EMPTY STRINGS as empty strings, not null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv-empty").toString
    val rows = Seq(
      (1L, "", 100L, Array.emptyByteArray, "", "", "src0", 0L, 5, 7),
      (2L, "https://x/2", 200L, "<p>x</p>".getBytes("UTF-8"), "x", "en", "src1", 1L, -5, -7))
      .toDF("doc_id", "url", "ts_sec", "html", "text", "lang", "source",
        "n_chars", "ilat", "ilon")
      .withColumn("warc_ts", timestamp_seconds(col("ts_sec")))
    Formats.writeCsv(rows, dir)
    val got = Formats.readCsv(spark, dir).orderBy("doc_id").collect()
    assert(got.length === 2)
    val r1 = got(0)
    assert(r1.getString(r1.fieldIndex("url")) === "", "empty url became null/other")
    assert(r1.getString(r1.fieldIndex("text")) === "", "empty text became null/other")
    assert(r1.getString(r1.fieldIndex("lang")) === "")
    assert(r1.getAs[Array[Byte]]("html").isEmpty, "empty html blob lost")
  }

  test("warc-style records: payload bytes exact, text re-derived byte-identically") {
    val dir = Files.createTempDirectory("graft-warc").toString
    val pages = Pages.fromDocuments(spark, sf0001)
    Formats.writeWarc(pages, dir)
    val got = Formats.readWarc(spark, dir)
    assert(got.count() === pages.count())
    val want = pages
      .select(col("doc_id"), col("url"), col("ts_sec"), md5(col("html")).as("hm"), col("text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val gotRows = got
      .select(col("doc_id"), col("url"), col("ts_sec"), md5(col("html")).as("hm"), col("text"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // text equality here IS the extract_text(html) == text invariant (B3)
    assert(gotRows === want)
  }

  test("corrupt warc records degrade (dropped), not abort — including torn records") {
    val dir = Files.createTempDirectory("graft-warc-bad").toString
    val pages = Pages.fromDocuments(spark, sf0001).limit(5)
    Formats.writeWarc(pages, dir)
    // garbage, a TORN record (valid first line, missing the rest — would
    // reach cast('') and abort under ANSI without the full-structure
    // gate), and a header-injection attempt inside the URI line
    Files.writeString(java.nio.file.Paths.get(dir, "part-junk.txt"),
      "not a warc record at all" + Formats.WarcSep +
        "WARC-Record-ID: 99\njunk" + Formats.WarcSep +
        "WARC-Record-ID: 98\nWARC-Target-URI: http://x/WARC-Date: 1\njunk" + Formats.WarcSep)
    val got = Formats.readWarc(spark, dir)
    assert(got.count() === 5)
  }

  test("warc round-trips pre-epoch (negative) timestamps") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-warc-neg").toString
    val rows = Seq((7L, "https://a/7", -5L, Array[Byte](1), "x", "en", "s0", 1L, 0, 0))
      .toDF("doc_id", "url", "ts_sec", "html", "text", "lang", "source", "n_chars", "ilat", "ilon")
      .withColumn("warc_ts", timestamp_seconds(col("ts_sec")))
    Formats.writeWarc(rows, dir)
    val got = Formats.readWarc(spark, dir).select("doc_id", "ts_sec").collect()
    assert(got.length === 1 && got(0).getLong(1) === -5L)
  }

  test("csv round-trip survives newlines and quotes embedded in text") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-csv-nl").toString
    val tricky = Seq(
      (1L, "https://a/1", 100L, Array[Byte](1, 2), "line one\nline two", "en", "s0", 17L, 5, 6),
      (2L, "https://a/2", 200L, Array[Byte](3), "quote \" comma , end", "de", "s1", 19L, 7, 8))
      .toDF("doc_id", "url", "ts_sec", "html", "text", "lang", "source", "n_chars", "ilat", "ilon")
      .withColumn("warc_ts", timestamp_seconds(col("ts_sec")))
    Formats.writeCsv(tricky, dir)
    assert(digest(Formats.readCsv(spark, dir)) === digest(tricky))
  }
}
