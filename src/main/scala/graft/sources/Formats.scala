package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion source formats beyond parquet — the shapes a crawl pipeline
  * actually receives (SURVEY.md §2.A): JSON-lines and CSV with explicit
  * schemas (never inferred — schema inference re-scans the input and
  * guesses types differently per sample at scale), and a WARC-style
  * record-per-block text format parsed with codegen'd regexp extraction.
  *
  * Binary html is hex-encoded in the text formats (text sources can't
  * carry raw bytes, and Spark's base64 emits MIME-chunked output with
  * embedded newlines that breaks CSV rows and header lines — hex has no
  * special characters at all); every reader reproduces the pages schema
  * exactly, so downstream operators are source-agnostic. Round-trip
  * equality including html bytes is gated in FormatsSpec.
  */
object Formats {

  /** Explicit text-format schema: html carried as hex. */
  private val textSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("ts_sec", LongType, nullable = false),
    StructField("html_hex", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("ilat", IntegerType, nullable = false),
    StructField("ilon", IntegerType, nullable = false)))

  private def encode(pages: DataFrame): DataFrame =
    pages.select(
      col("doc_id"), col("url"), col("ts_sec"),
      hex(col("html")).as("html_hex"),
      col("text"), col("lang"), col("source"), col("n_chars"),
      col("ilat"), col("ilon"))

  private def decode(df: DataFrame): DataFrame =
    df.select(
      col("doc_id"), col("url"),
      timestamp_seconds(col("ts_sec")).as("warc_ts"), col("ts_sec"),
      unhex(col("html_hex")).as("html"),
      col("text"), col("lang"), col("source"), col("n_chars"),
      col("ilat"), col("ilon"))

  // ---- JSONL ---------------------------------------------------------------

  def writeJsonl(pages: DataFrame, dir: String): Unit =
    encode(pages).write.mode("overwrite").json(dir)

  def readJsonl(spark: SparkSession, dir: String): DataFrame =
    decode(spark.read.schema(textSchema).json(dir))

  // ---- CSV -----------------------------------------------------------------

  // nullValue sentinel: Spark's CSV reader maps the nullValue token ("" by
  // default) to null — which silently turns EMPTY STRING fields (legal:
  // text = "" for a degenerate doc, empty html payload) into nulls and
  // breaks the byte-exact round trip. A token that can never appear in the
  // data keeps "" parsing as "".
  private val CsvNull = "\\N"

  def writeCsv(pages: DataFrame, dir: String): Unit =
    encode(pages).write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("nullValue", CsvNull).option("emptyValue", "\"\"")
      .csv(dir)

  def readCsv(spark: SparkSession, dir: String): DataFrame =
    decode(spark.read.schema(textSchema)
      .option("header", "true").option("escape", "\"")
      .option("nullValue", CsvNull)
      // the writer quotes embedded newlines in text; without multiLine
      // the reader would split such rows mid-field
      .option("multiLine", "true")
      .csv(dir))

  // ---- WARC-style records --------------------------------------------------
  // One record per text "line" using a custom record separator (lineSep):
  //   WARC-Record-ID: <doc_id>
  //   WARC-Target-URI: <url>
  //   WARC-Date: <ts_sec>
  //   Content: <html_hex>
  // The payload rides hex'd on the Content header so the separator can
  // never appear inside a record. Parsing is regexp_extract — pure codegen,
  // no UDF — and malformed records drop out via the doc-id filter rather
  // than failing the scan (one corrupt record must degrade, not abort).

  final val WarcSep = "\n\r\n"

  def writeWarc(pages: DataFrame, dir: String): Unit =
    encode(pages).select(concat(
        lit("WARC-Record-ID: "), col("doc_id"), lit("\n"),
        lit("WARC-Target-URI: "), col("url"), lit("\n"),
        lit("WARC-Date: "), col("ts_sec"), lit("\n"),
        lit("Content: "), col("html_hex")).as("value"))
      .write.mode("overwrite").option("lineSep", WarcSep).text(dir)

  def readWarc(spark: SparkSession, dir: String): DataFrame = {
    // FULL-structure validity gate BEFORE any cast: ANSI mode (Spark 4
    // default) turns a cast of a non-match ("") into a job abort, and the
    // contract here is corrupt records DROP, they don't kill the scan — a
    // first-line-only gate would still let a torn record reach the
    // WARC-Date cast. The gate also rejects header-injection (a url
    // carrying "\nContent: ..." adds lines and fails the structure).
    // digit counts are BOUNDED to 18 (always fits a long) — an unbounded
    // [0-9]+ would pass a 20-digit id through to cast(long), which under
    // ANSI aborts on overflow; WARC-Date admits a sign (pre-epoch ts_sec
    // values are legal and must round-trip)
    val rec = spark.read.option("lineSep", WarcSep).text(dir)
      .filter(col("value").rlike(
        "^WARC-Record-ID: [0-9]{1,18}\nWARC-Target-URI: [^\n]*\n" +
          "WARC-Date: -?[0-9]{1,18}\nContent: [0-9A-F]*$"))
    // (?m)^ anchors each field to its line start — a first-match-anywhere
    // pattern could otherwise be spoofed by "Name: x" inside the url
    def field(name: String) = regexp_extract(col("value"), s"(?m)^$name: ([^\n]*)", 1)
    val parsed = rec.select(
      field("WARC-Record-ID").cast("long").as("doc_id"),
      field("WARC-Target-URI").as("url"),
      field("WARC-Date").cast("long").as("ts_sec"),
      unhex(field("Content")).as("html"))
    // derive text via the byte-identical extraction invariant (B3): a WARC
    // capture carries only the payload; everything else re-derives
    graft.functions.GraftFunctions.register(spark)
    parsed
      .withColumn("warc_ts", timestamp_seconds(col("ts_sec")))
      .withColumn("text", graft.functions.GraftFunctions.extract_text(col("html")))
  }
}
