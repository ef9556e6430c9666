package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ClassifierQueries, CorpusQueries, CurationQueries, GeoQueries, GeoSemanticQueries, GeoStatsQueries, GraphQueries, IndexStoreQueries, MultiModal, RelationalQueries, SimilarityQueries, TextQueries, Tiling}
import graft.sources.{Footprints, Pages}

/** Driver contract — see SURVEY.md §7 + FIXTURES.md.
  *
  * Every `queries` entry has a DuckDB twin in `oracleSql` (same column
  * names, same ORDER BY, integer arithmetic end-to-end) unless the operator
  * is not SQL-expressible, in which case it is covered by the ScalaTest
  * layer instead and gets a weaker rows-only check here.
  */
object SparkEntry {

  /** Flagship: geotag -> cell index -> broadcast PIP join vs footprint
    * covers -> per-footprint inventory (GIPS inventory analog). */
  def entry(spark: SparkSession): DataFrame =
    GeoQueries.pipInventory(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pip_inventory" -> ((s, d) => GeoQueries.pipInventory(s, d)),
    "q02_cell_inventory" -> ((s, d) => GeoQueries.cellInventory(s, d)),
    "q03_partitioned_pip" -> ((s, d) => GeoQueries.partitionedPip(s, d)),
    "q04_salted_pip" -> ((s, d) => GeoQueries.saltedPipJoin(s, d)),
    "q05_range_join" -> ((s, d) => GeoQueries.rangeJoin(s, d)),
    "q06_asof_join" -> ((s, d) => GeoQueries.asofJoin(s, d)),
    "q07_knn" -> ((s, d) => GeoQueries.knnJoin(s, d)),
    "q08_uncovered" -> ((s, d) => GeoQueries.uncoveredCells(s, d)),
    "q09_parent_rollup" -> ((s, d) => GeoQueries.parentRollup(s, d)),
    "q10_pricing_summary" -> ((s, d) => RelationalQueries.pricingSummary(s, d)),
    "q11_top_orders" -> ((s, d) => RelationalQueries.topOrdersPerCust(s, d)),
    "q12_event_gaps" -> ((s, d) => RelationalQueries.eventGaps(s, d)),
    "q13_rolling_value" -> ((s, d) => RelationalQueries.rollingValue(s, d)),
    "q14_lang_source_rollup" -> ((s, d) => RelationalQueries.langSourceRollup(s, d)),
    "q15_cust_activity" -> ((s, d) => RelationalQueries.custOrderActivity(s, d)),
    "q16_source_setdiff" -> ((s, d) => RelationalQueries.sourceSetDiff(s, d)),
    "q17_top_cells" -> ((s, d) => RelationalQueries.topCells(s, d)),
    "q18_cell_distincts" -> ((s, d) => RelationalQueries.cellDistincts(s, d)),
    "q19_latest_per_source" -> ((s, d) => RelationalQueries.latestPerSource(s, d)),
    "q20_event_props" -> ((s, d) => RelationalQueries.eventProps(s, d)),
    "q21_url_parts" -> ((s, d) => RelationalQueries.urlParts(s, d)),
    "q22_doy_window" -> ((s, d) => RelationalQueries.doyWindow(s, d)),
    "q23_token_stats" -> ((s, d) => TextQueries.tokenStats(s, d)),
    "q24_quality_buckets" -> ((s, d) => TextQueries.qualityBuckets(s, d)),
    "q25_langid" -> ((s, d) => TextQueries.langId(s, d)),
    "q26_fingerprint" -> ((s, d) => TextQueries.fingerprint(s, d)),
    "q27_exact_dedup" -> ((s, d) => TextQueries.exactDedup(s, d)),
    "q28_minhash_sigs" -> ((s, d) => TextQueries.minhashSigs(s, d)),
    "q29_lsh_neardup" -> ((s, d) => TextQueries.lshNearDupPairs(s, d)),
    "q30_simhash" -> ((s, d) => TextQueries.simhash(s, d)),
    "q31_ann_l2" -> ((s, d) => SimilarityQueries.l2TopK(s, d)),
    "q32_ann_lsh" -> ((s, d) => SimilarityQueries.lshTopK(s, d)),
    "q33_ann_buckets" -> ((s, d) => SimilarityQueries.bucketStats(s, d)),
    "q34_rasterize" -> ((s, d) => Tiling.rasterizeLong(s, d)),
    "q35_mosaic" -> ((s, d) => Tiling.mosaicLong(s, d)),
    "q36_tile_stats" -> ((s, d) => Tiling.tileStats(s, d)),
    "q37_percentiles" -> ((s, d) => RelationalQueries.valuePercentiles(s, d)),
    "q38_range_frame" -> ((s, d) => RelationalQueries.rangeFrameCounts(s, d)),
    "q39_top_tokens" -> ((s, d) => RelationalQueries.topTokens(s, d)),
    "q40_lang_source_cube" -> ((s, d) => RelationalQueries.langSourceCube(s, d)),
    "q41_embedding_neardup" -> ((s, d) => SimilarityQueries.nearDupPairs(s, d)),
    "q42_knn_exact" -> ((s, d) => GeoQueries.knnJoinExact(s, d, k = 25, initRings = 2)),
    "q43_string_fns" -> ((s, d) => RelationalQueries.stringFns(s, d)),
    "q44_blocked_jaccard" -> ((s, d) => TextQueries.blockedJaccard(s, d)),
    "q45_regex_tokens" -> ((s, d) => TextQueries.regexTokens(s, d)),
    "q46_ann_ivf" -> ((s, d) => SimilarityQueries.ivfTopK(s, d)),
    "q47_winnow" -> ((s, d) => TextQueries.winnowFingerprints(s, d)),
    "q48_snapshot_union" -> ((s, d) => RelationalQueries.snapshotUnion(s, d)),
    "q49_coverage_frac" -> ((s, d) => GeoQueries.coverageInventory(s, d)),
    "q50_snapshot_diff" -> ((s, d) => graft.jobs.IngestJob.snapshotDiff(s, d)),
    // no oracle twin (sketch internals are engine-specific): the driver
    // records a rows-only check; ±5% vs exact is gated in MetricsSpec
    "q51_hll_distincts" -> ((s, d) => RelationalQueries.cellDistinctsApprox(s, d)),
    "q52_band_math" -> ((s, d) => Tiling.bandMathLong(s, d)),
    "q53_pyramid" -> ((s, d) => Tiling.pyramidLong(s, d)),
    "q54_sessionize" -> ((s, d) => RelationalQueries.sessionize(s, d)),
    "q55_event_pivot" -> ((s, d) => RelationalQueries.eventPivot(s, d)),
    "q56_stratified_sample" -> ((s, d) => RelationalQueries.stratifiedSample(s, d)),
    "q57_tfidf" -> ((s, d) => TextQueries.tfidfTopTerms(s, d)),
    "q58_neardup_components" -> ((s, d) => GraphQueries.nearDupComponents(s, d)),
    "q59_footprint_overlap" -> ((s, d) => GeoQueries.footprintOverlap(s, d)),
    "q60_compact" -> ((s, d) => GeoQueries.compactCells(s, d)),
    "q61_merge_upsert" -> ((s, d) => graft.jobs.IngestJob.mergeUpsert(s, d)),
    "q62_clean_corpus" -> ((s, d) => TextQueries.cleanCorpus(s, d)),
    // no oracle twin (per-subspace k-means codebooks are impractical as
    // iterated SQL): driver records a rows-only check; recall-vs-brute-
    // force is gated in SimilaritySpec like every ANN recall property
    "q63_ann_pq" -> ((s, d) => SimilarityQueries.pqTopK(s, d)),
    // no oracle twin (sketch internals engine-specific — rows-only);
    // ±1% rank error vs the exact q37 percentiles is gated in ScalaTest
    "q64_percentiles_approx" -> ((s, d) => RelationalQueries.valuePercentilesApprox(s, d)),
    "q65_uncompact" -> ((s, d) => GeoQueries.uncompactInventory(s, d)),
    "q66_event_unpivot" -> ((s, d) => RelationalQueries.eventUnpivot(s, d)),
    "q67_knn_table" -> ((s, d) => GeoQueries.knnSelfJoin(s, d)),
    "q68_crawl_drift" -> ((s, d) => GeoQueries.crawlDrift(s, d)),
    "q69_dense_clusters" -> ((s, d) => GeoQueries.denseCellClusters(s, d, minPages = 3)),
    "q70_nearest_footprint" -> ((s, d) => GeoQueries.nearestFootprint(s, d)),
    "q71_value_histogram" -> ((s, d) => RelationalQueries.valueHistogram(s, d)),
    "q72_reservoir" -> ((s, d) => RelationalQueries.reservoirPerLang(s, d)),
    "q73_cust_quartiles" -> ((s, d) => RelationalQueries.custQuartiles(s, d)),
    "q74_media_inventory" -> ((s, d) => MultiModal.mediaInventoryQuery(s, d)),
    "q75_incremental_inventory" -> ((s, d) => graft.jobs.IngestJob.incrementalInventory(s, d)),
    "q76_dsv2_inventory" -> ((s, d) => graft.jobs.IngestJob.dsv2Inventory(s, d)),
    "q77_shard_packing" -> ((s, d) => graft.operators.CorpusQueries.shardPacking(s, d)),
    "q78_decontaminate" -> ((s, d) => graft.operators.CorpusQueries.decontaminate(s, d)),
    "q79_pii_scrub" -> ((s, d) => graft.operators.CorpusQueries.piiScrub(s, d)),
    "q80_domain_cap" -> ((s, d) => graft.operators.CorpusQueries.domainCap(s, d)),
    "q81_frame_sample" -> ((s, d) => MultiModal.frameSampleQuery(s, d)),
    "q82_media_resize" -> ((s, d) => MultiModal.resizeQuery(s, d)),
    "q83_footprint_visits" -> ((s, d) => GeoQueries.footprintVisits(s, d)),
    "q84_coverage_gaps" -> ((s, d) => GeoQueries.coverageGaps(s, d)),
    "q85_media_quarantine" -> ((s, d) => MultiModal.quarantineQuery(s, d)),
    "q86_corpus_pipeline" -> ((s, d) => CorpusQueries.corpusPipeline(s, d)),
    "q87_mor_delete" -> ((s, d) => graft.jobs.IngestJob.morDeleteQuery(s, d)),
    "q88_chunk_dedup" -> ((s, d) => TextQueries.chunkDedup(s, d)),
    "q89_repetition" -> ((s, d) => TextQueries.repetitionSignals(s, d)),
    "q90_crawl_corridor" -> ((s, d) => GeoQueries.crawlCorridor(s, d)),
    "q91_mor_upsert" -> ((s, d) => graft.jobs.IngestJob.morUpsertQuery(s, d)),
    "q92_changelog" -> ((s, d) => graft.jobs.IngestJob.changelogQuery(s, d)),
    "q93_ann_sq8" -> ((s, d) => SimilarityQueries.sq8TopK(s, d)),
    "q94_vectorize" -> ((s, d) => GeoQueries.vectorizeRaster(s, d)),
    "q95_corridor_sweep" -> ((s, d) => GeoQueries.corridorSweep(s, d)),
    "q96_cosine_topk" -> ((s, d) => SimilarityQueries.cosineTopK(s, d)),
    "q97_tfidf_pairs" -> ((s, d) => TextQueries.tfidfPairSim(s, d)),
    "q98_cosine_ann" -> ((s, d) => SimilarityQueries.cosineIvfTopK(s, d)),
    "q99_cell_centroids" -> ((s, d) => GeoSemanticQueries.cellCentroids(s, d)),
    "q100_geo_outliers" -> ((s, d) => GeoSemanticQueries.geoOutliers(s, d)),
    "q101_dominant_lang" -> ((s, d) => GeoSemanticQueries.dominantLang(s, d)),
    "q102_semantic_drift" -> ((s, d) => GeoSemanticQueries.semanticDrift(s, d)),
    "q103_incremental_centroids" -> ((s, d) => GeoSemanticQueries.incrementalCentroids(s, d)),
    "q104_centroid_pyramid" -> ((s, d) => GeoSemanticQueries.centroidPyramid(s, d)),
    "q105_span_dedup" -> ((s, d) => CurationQueries.spanDedup(s, d)),
    "q106_page_rank" -> ((s, d) => CurationQueries.pageRank(s, d)),
    "q107_url_canonical" -> ((s, d) => CurationQueries.urlCanonical(s, d)),
    "q108_token_rank_quality" -> ((s, d) => CurationQueries.tokenRankQuality(s, d)),
    "q109_lang_rebalance" -> ((s, d) => CurationQueries.langRebalance(s, d)),
    "q110_phrase_search" -> ((s, d) => CurationQueries.phraseSearch(s, d)),
    "q111_kde_heatmap" -> ((s, d) => GeoStatsQueries.kdeHeatmap(s, d)),
    "q112_dissolve_area" -> ((s, d) => GeoStatsQueries.dissolveArea(s, d)),
    // no oracle twin (iterative BPE trainer is not SQL-expressible):
    // driver records a rows-only check; CurationSpec pins a hand-computed
    // merge sequence and the trainer invariants
    "q113_bpe_merges" -> ((s, d) => CurationQueries.bpeMerges(s, d)),
    "q114_bigram_coverage" -> ((s, d) => CurationQueries.bigramCoverage(s, d)),
    "q115_webgraph_audit" -> ((s, d) => CurationQueries.webgraphAudit(s, d)),
    "q116_containment" -> ((s, d) => CurationQueries.containmentPairs(s, d)),
    "q117_moran_components" -> ((s, d) => GeoStatsQueries.moranComponents(s, d)),
    "q118_syndication" -> ((s, d) => CurationQueries.syndicationMatrix(s, d)),
    "q119_dedup_timeline" -> ((s, d) => CurationQueries.dedupTimeline(s, d)),
    "q120_leakage_split" -> ((s, d) => GraphQueries.leakageSafeSplit(s, d)),
    "q121_hard_negatives" -> ((s, d) => SimilarityQueries.hardNegatives(s, d)),
    "q122_lisa_hotspots" -> ((s, d) => GeoStatsQueries.lisaHotspots(s, d)),
    // no oracle twin (applies the iterative BPE trainer's merges):
    // rows-only; segmentation laws + corpus determinism in CurationSpec
    "q123_bpe_encode" -> ((s, d) => CurationQueries.bpeEncode(s, d)),
    "q124_bitext_mining" -> ((s, d) => SimilarityQueries.bitextMining(s, d)),
    "q125_footprint_buffer" -> ((s, d) => GeoStatsQueries.footprintBuffer(s, d)),
    "q126_robots_filter" -> ((s, d) => CurationQueries.robotsFilter(s, d)),
    "q127_served_ann" -> ((s, d) => IndexStoreQueries.servedCosineTopK(s, d)),
    "q128_index_delta" -> ((s, d) => IndexStoreQueries.indexDeltaAudit(s, d)),
    "q129_idw_surface" -> ((s, d) => GeoStatsQueries.idwSurface(s, d)),
    "q130_ring_decay" -> ((s, d) => GeoStatsQueries.ringDecay(s, d)),
    "q131_trajectory" -> ((s, d) => GeoStatsQueries.crawlerTrajectory(s, d)),
    "q132_nb_confusion" -> ((s, d) => ClassifierQueries.nbConfusion(s, d)),
    "q133_packing_balance" -> ((s, d) => ClassifierQueries.packingBalance(s, d)),
    "q134_areal_interp" -> ((s, d) => GeoStatsQueries.arealInterpolation(s, d)),
    "q135_adaptive_grid" -> ((s, d) => GeoStatsQueries.adaptiveGrid(s, d)),
    "q136_emerging_hotspots" -> ((s, d) => GeoStatsQueries.emergingHotspots(s, d)),
    "q137_filter_cascade" -> ((s, d) => CurationQueries.filterCascade(s, d)),
    "q138_territory" -> ((s, d) => GeoStatsQueries.territoryAssign(s, d)),
    "q139_chunk_registry" -> ((s, d) => IndexStoreQueries.chunkRegistryAudit(s, d)),
    "q140_density_gradient" -> ((s, d) => GeoStatsQueries.densityGradient(s, d)),
    "q141_location_quotient" -> ((s, d) => GeoStatsQueries.locationQuotient(s, d)),
    "q142_vocab_coverage" -> ((s, d) => ClassifierQueries.vocabCoverage(s, d)),
    "q143_collocations" -> ((s, d) => ClassifierQueries.collocations(s, d)),
  )

  // ---- oracle SQL ---------------------------------------------------------
  // All single-line ANSI SQL, DuckDB-1.0-safe, runnable against views named
  // after the driver tables. `pages` is derived from `documents` with the
  // same integer arithmetic the Spark side uses (Pages.oracleCte).

  private val P = s"WITH pages AS (${Pages.oracleCte})"
  private val FP = Footprints.sqlValues
  private def cell(l: Int, ilat: String = "p.ilat", ilon: String = "p.ilon") =
    Pages.sqlCell(ilat, ilon, l)
  private val boxJoin =
    "p.ilat BETWEEN fp.ilat0 AND fp.ilat1 AND p.ilon BETWEEN fp.ilon0 AND fp.ilon1 " +
      "AND p.ts_sec BETWEEN fp.tfrom AND fp.tto"

  def oracleSql: Map[String, String] = Map(
    "q01_pip_inventory" ->
      (s"$P SELECT fp.fp_id AS fp_id, count(*) AS n_pages, count(DISTINCT p.lang) AS n_langs, " +
        s"count(DISTINCT ${cell(6)}) AS n_cells, CAST(sum(p.n_chars) AS BIGINT) AS sum_chars, " +
        s"min(p.doc_id) AS min_doc, max(p.doc_id) AS max_doc " +
        s"FROM pages p JOIN $FP ON $boxJoin GROUP BY fp.fp_id ORDER BY fp.fp_id"),
    "q02_cell_inventory" ->
      (s"$P SELECT fp.fp_id AS fp_id, ${cell(4)} AS cell4, count(*) AS n_pages, " +
        s"count(DISTINCT p.url) AS n_urls FROM pages p JOIN $FP ON $boxJoin " +
        s"GROUP BY fp.fp_id, ${cell(4)} ORDER BY fp.fp_id, cell4"),
    "q03_partitioned_pip" ->
      (s"$P SELECT fp.fp_id AS fp_id, count(*) AS n_pages, count(DISTINCT p.source) AS n_sources " +
        s"FROM pages p JOIN $FP ON $boxJoin GROUP BY fp.fp_id ORDER BY fp.fp_id"),
    "q04_salted_pip" ->
      (s"$P SELECT fp.fp_id AS fp_id, count(*) AS n_pages, count(DISTINCT p.lang) AS n_langs " +
        s"FROM pages p JOIN $FP ON $boxJoin GROUP BY fp.fp_id ORDER BY fp.fp_id"),
    "q05_range_join" ->
      (s"$P SELECT fp.fp_id AS fp_id, fp.tfrom AS tfrom, fp.tto AS tto, count(*) AS n_pages, " +
        s"min(p.ts_sec) AS first_ts, max(p.ts_sec) AS last_ts " +
        s"FROM pages p JOIN $FP ON $boxJoin WHERE fp.tto <> ${Pages.Epoch + 2000000000L} " +
        s"GROUP BY fp.fp_id, fp.tfrom, fp.tto ORDER BY fp.fp_id"),
    "q06_asof_join" ->
      (s"$P SELECT fp.fp_id AS fp_id, p.source AS source, max(p.ts_sec) AS asof_ts, " +
        s"arg_max(p.doc_id, p.ts_sec) AS asof_doc FROM pages p JOIN $FP " +
        s"ON p.ilat BETWEEN fp.ilat0 AND fp.ilat1 AND p.ilon BETWEEN fp.ilon0 AND fp.ilon1 " +
        s"AND p.ts_sec <= fp.tto GROUP BY fp.fp_id, p.source ORDER BY fp_id, source"),
    "q07_knn" ->
      (s"$P, d AS (SELECT q.qid AS qid, p.doc_id AS doc_id, " +
        s"CAST((q.qlat - p.ilat) * (q.qlat - p.ilat) + (q.qlon - p.ilon) * (q.qlon - p.ilon) AS BIGINT) AS dist2 " +
        s"FROM ${GeoQueries.knnQueriesSqlValues} CROSS JOIN pages p), " +
        s"r AS (SELECT qid, doc_id, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, doc_id) AS rnk FROM d) " +
        s"SELECT qid, CAST(rnk AS INT) AS rnk, doc_id, dist2 FROM r WHERE rnk <= 5 ORDER BY qid, rnk"),
    "q42_knn_exact" ->
      (s"$P, d AS (SELECT q.qid AS qid, p.doc_id AS doc_id, " +
        s"CAST((q.qlat - p.ilat) * (q.qlat - p.ilat) + (q.qlon - p.ilon) * (q.qlon - p.ilon) AS BIGINT) AS dist2 " +
        s"FROM ${GeoQueries.knnQueriesSqlValues} CROSS JOIN pages p), " +
        s"r AS (SELECT qid, doc_id, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, doc_id) AS rnk FROM d) " +
        s"SELECT qid, CAST(rnk AS INT) AS rnk, doc_id, dist2 FROM r WHERE rnk <= 25 ORDER BY qid, rnk"),
    "q70_nearest_footprint" ->
      (s"$P, d AS (SELECT p.doc_id AS doc_id, fp.fp_id AS fp_id, " +
        "CAST(p.ilat * 2 - (fp.ilat0 + fp.ilat1) AS BIGINT) * (p.ilat * 2 - (fp.ilat0 + fp.ilat1)) + " +
        "CAST(p.ilon * 2 - (fp.ilon0 + fp.ilon1) AS BIGINT) * (p.ilon * 2 - (fp.ilon0 + fp.ilon1)) AS d2 " +
        s"FROM pages p CROSS JOIN ${Footprints.sqlValues}), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY d2, fp_id) AS rn FROM d) " +
        "SELECT fp_id, count(*) AS n_pages, min(d2) AS min_d2, max(d2) AS max_d2 " +
        "FROM r WHERE rn = 1 GROUP BY fp_id ORDER BY fp_id"),
    "q94_vectorize" -> {
      val cell = Pages.sqlCell("ilat", "ilon", 6)
      s"WITH RECURSIVE pages AS (${Pages.oracleCte}), " +
        s"occ AS (SELECT $cell AS cell, count(*) AS n_pages FROM pages GROUP BY 1), " +
        "c AS (SELECT cell, n_pages, least(n_pages // 3, 3) AS cls FROM occ), " +
        "e0 AS (SELECT a.cell AS u, b.cell AS v FROM c a JOIN c b ON a.cls = b.cls " +
        "AND abs(a.cell % 64 - b.cell % 64) <= 1 AND abs(a.cell // 64 - b.cell // 64) <= 1 " +
        "AND a.cell <> b.cell), " +
        "reach(u, v) AS (SELECT cell, cell FROM c UNION SELECT e0.u, r.v FROM e0 JOIN reach r ON e0.v = r.u), " +
        "lab AS (SELECT u AS cell, min(v) AS region FROM reach GROUP BY u), " +
        "reg AS (SELECT c.cls, lab.region, count(*) AS n_cells, sum(c.n_pages) AS sp " +
        "FROM c JOIN lab ON c.cell = lab.cell GROUP BY 1, 2) " +
        "SELECT cls, count(*) AS n_regions, CAST(sum(n_cells) AS BIGINT) AS n_cells, " +
        "CAST(max(n_cells) AS BIGINT) AS max_region_cells, CAST(sum(sp) AS BIGINT) AS sum_pages " +
        "FROM reg GROUP BY cls ORDER BY cls"
    },
    "q69_dense_clusters" -> {
      val side = 1L << GeoQueries.JoinLevel
      s"WITH RECURSIVE pages AS (${Pages.oracleCte}), " +
        s"dense AS (SELECT ${Pages.sqlCell("p.ilat", "p.ilon", GeoQueries.JoinLevel)} AS cell, " +
        "count(*) AS n_pages FROM pages p GROUP BY 1 HAVING count(*) >= 3), " +
        s"e0 AS (SELECT a.cell AS u, b.cell AS v FROM dense a JOIN dense b ON " +
        s"abs(a.cell % $side - b.cell % $side) <= 1 AND abs(a.cell // $side - b.cell // $side) <= 1 " +
        "AND a.cell <> b.cell), " +
        "reach(u, v) AS (SELECT cell, cell FROM dense UNION SELECT e0.u, r.v FROM e0 JOIN reach r ON e0.v = r.u), " +
        "lab AS (SELECT u AS cell, min(v) AS cluster FROM reach GROUP BY u) " +
        "SELECT lab.cluster AS cluster, count(*) AS n_cells, CAST(sum(d.n_pages) AS BIGINT) AS sum_pages, " +
        "min(d.cell) AS min_cell, max(d.cell) AS max_cell " +
        "FROM dense d JOIN lab ON d.cell = lab.cell GROUP BY 1 ORDER BY cluster"
    },
    "q68_crawl_drift" ->
      (s"$P, l AS (SELECT source, ilat, ilon, " +
        "lag(ilat) OVER (PARTITION BY source ORDER BY ts_sec, doc_id) AS plat, " +
        "lag(ilon) OVER (PARTITION BY source ORDER BY ts_sec, doc_id) AS plon FROM pages), " +
        "d AS (SELECT source, CAST((ilat - plat) * (ilat - plat) + (ilon - plon) * (ilon - plon) AS BIGINT) AS d2 " +
        "FROM l WHERE plat IS NOT NULL) " +
        "SELECT source, count(*) AS n_hops, CAST(sum(d2) AS BIGINT) AS sum_d2, max(d2) AS max_d2 " +
        "FROM d GROUP BY source ORDER BY source"),
    "q95_corridor_sweep" ->
      (s"$P, l AS (SELECT source, doc_id, ilat, ilon, " +
        "lag(ilat) OVER (PARTITION BY source ORDER BY ts_sec, doc_id) AS plat, " +
        "lag(ilon) OVER (PARTITION BY source ORDER BY ts_sec, doc_id) AS plon FROM pages), " +
        "st AS (SELECT source, doc_id, ilat, ilon, plat, plon, " +
        "greatest(abs(ilat - plat), abs(ilon - plon), 1) AS n FROM l WHERE plat IS NOT NULL), " +
        "e AS (SELECT st.*, unnest(generate_series(0, st.n)) AS i FROM st), " +
        "pt AS (SELECT source, doc_id, n, plat * n + (ilat - plat) * i AS latn, " +
        "plon * n + (ilon - plon) * i AS lonn FROM e) " +
        s"SELECT source, fp.fp_id AS fp_id, count(DISTINCT doc_id) AS n_segments, " +
        "CAST(count(*) AS BIGINT) AS n_steps " +
        s"FROM pt JOIN $FP ON fp.ilat0 * n <= latn AND latn <= fp.ilat1 * n " +
        "AND fp.ilon0 * n <= lonn AND lonn <= fp.ilon1 * n " +
        "GROUP BY source, fp.fp_id ORDER BY source, fp_id"),
    "q90_crawl_corridor" ->
      (s"$P, l AS (SELECT source, doc_id, ilat, ilon, " +
        "lag(ilat) OVER (PARTITION BY source ORDER BY ts_sec, doc_id) AS plat, " +
        "lag(ilon) OVER (PARTITION BY source ORDER BY ts_sec, doc_id) AS plon FROM pages), " +
        "st AS (SELECT source, doc_id, ilat, ilon, plat, plon, " +
        "greatest(abs(ilat - plat), abs(ilon - plon), 1) AS n FROM l WHERE plat IS NOT NULL), " +
        "e AS (SELECT st.*, unnest(generate_series(0, st.n)) AS i FROM st), " +
        "c AS (SELECT source, doc_id, " +
        "((((plat + 900) * n + (ilat - plat) * i) * 64) // (1800 * n)) * 64 + " +
        "(((plon + 1800) * n + (ilon - plon) * i) * 64) // (3600 * n) AS cell FROM e) " +
        "SELECT source, count(DISTINCT doc_id) AS n_segments, CAST(count(*) AS BIGINT) AS n_steps, " +
        "count(DISTINCT cell) AS n_cells FROM c GROUP BY source ORDER BY source"),
    "q67_knn_table" ->
      (s"$P, q AS (SELECT doc_id AS qid, ilat AS qlat, ilon AS qlon FROM pages WHERE doc_id % 10 = 1), " +
        "d AS (SELECT q.qid AS qid, p.doc_id AS doc_id, " +
        "CAST((q.qlat - p.ilat) * (q.qlat - p.ilat) + (q.qlon - p.ilon) * (q.qlon - p.ilon) AS BIGINT) AS dist2 " +
        "FROM q CROSS JOIN pages p), " +
        "r AS (SELECT qid, doc_id, dist2, row_number() OVER (PARTITION BY qid ORDER BY dist2, doc_id) AS rnk FROM d) " +
        "SELECT qid, CAST(rnk AS INT) AS rnk, doc_id, dist2 FROM r WHERE rnk <= 3 ORDER BY qid, rnk"),
    "q08_uncovered" ->
      (s"$P SELECT ${cell(4)} AS cell4, count(*) AS n_pages FROM pages p " +
        s"WHERE NOT EXISTS (SELECT 1 FROM $FP WHERE $boxJoin) " +
        s"GROUP BY ${cell(4)} HAVING count(*) >= 3 ORDER BY cell4"),
    "q09_parent_rollup" ->
      (s"$P SELECT ${cell(2)} AS cell2, count(*) AS n_pages, " +
        s"count(DISTINCT ${cell(6)}) AS n_subcells FROM pages p " +
        s"GROUP BY ${cell(2)} ORDER BY cell2"),
    "q49_coverage_frac" -> {
      // integer twin of the JTS coverage fraction: cells at level L are the
      // SNAPPED half-open regions [ceil(c*G/p), ceil((c+1)*G/p)) in
      // deci-degree units (CellIndex.boundary), footprint boxes are
      // [ilon0, ilon1+1) x [ilat0, ilat1+1); box-box intersection areas
      // are exact integers, the fraction one IEEE double division.
      val L = GeoQueries.JoinLevel
      val p = 1L << L
      s"$P, cells AS (SELECT CAST(rm.range AS BIGINT) AS cell, " +
        s"((rm.range % $p) * 3600 + ${p - 1}) // $p - 1800 AS xlo, " +
        s"(((rm.range % $p) + 1) * 3600 + ${p - 1}) // $p - 1800 AS xhi, " +
        s"((rm.range // $p) * 1800 + ${p - 1}) // $p - 900 AS ylo, " +
        s"(((rm.range // $p) + 1) * 1800 + ${p - 1}) // $p - 900 AS yhi " +
        s"FROM range(0, ${p * p}) rm), " +
        s"cov AS (SELECT fp.fp_id AS fp_id, c.cell AS cell, " +
        "CAST(floor((CAST(greatest(0, least(fp.ilon1 + 1, c.xhi) - greatest(fp.ilon0, c.xlo)) * " +
        "greatest(0, least(fp.ilat1 + 1, c.yhi) - greatest(fp.ilat0, c.ylo)) AS DOUBLE) / " +
        "CAST((c.xhi - c.xlo) * (c.yhi - c.ylo) AS DOUBLE)) * 1000) AS BIGINT) AS cov_m " +
        s"FROM $FP CROSS JOIN cells c " +
        "WHERE least(fp.ilon1 + 1, c.xhi) > greatest(fp.ilon0, c.xlo) " +
        "AND least(fp.ilat1 + 1, c.yhi) > greatest(fp.ilat0, c.ylo)) " +
        s"SELECT cov.fp_id AS fp_id, cov.cell AS cell, cov.cov_m AS cov_m, count(*) AS n_pages " +
        s"FROM cov JOIN pages p ON ${cell(L)} = cov.cell " +
        "GROUP BY cov.fp_id, cov.cell, cov.cov_m ORDER BY fp_id, cell"
    },
    "q50_snapshot_diff" ->
      (s"$P SELECT lang, count(*) AS n_new, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM pages WHERE doc_id % 3 = 0 GROUP BY lang ORDER BY lang"),
    "q87_mor_delete" ->
      (s"$P SELECT lang, count(*) AS n_docs, count(DISTINCT doc_id) AS n_keys, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM pages WHERE doc_id % 10 <> 3 GROUP BY lang ORDER BY lang"),
    "q84_coverage_gaps" ->
      (s"$P, j AS (SELECT DISTINCT fp.fp_id, p.ts_sec // 86400 AS day " +
        s"FROM pages p JOIN $FP ON $boxJoin), " +
        "l AS (SELECT fp_id, day, lag(day) OVER (PARTITION BY fp_id ORDER BY day) AS prev FROM j) " +
        "SELECT fp_id, count(*) AS n_days, " +
        "CAST(sum(CASE WHEN day - prev > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps, " +
        "CAST(coalesce(max(CASE WHEN day - prev > 1 THEN day - prev - 1 END), 0) AS BIGINT) AS max_gap_days " +
        "FROM l GROUP BY fp_id ORDER BY fp_id"),
    "q83_footprint_visits" ->
      (s"$P, j AS (SELECT fp.fp_id, p.source, p.ts_sec, p.doc_id " +
        s"FROM pages p JOIN $FP ON $boxJoin), " +
        "l AS (SELECT *, lag(ts_sec) OVER (PARTITION BY fp_id, source ORDER BY ts_sec, doc_id) AS prev FROM j), " +
        "s AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR ts_sec - prev > 43200 THEN 1 ELSE 0 END) " +
        "OVER (PARTITION BY fp_id, source ORDER BY ts_sec, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM l), " +
        "v AS (SELECT fp_id, source, sid, count(*) AS n_crawls, max(ts_sec) - min(ts_sec) AS span " +
        "FROM s GROUP BY fp_id, source, sid) " +
        "SELECT fp_id, source, count(*) AS n_visits, CAST(sum(n_crawls) AS BIGINT) AS n_crawls, " +
        "CAST(max(span) AS BIGINT) AS max_visit_span " +
        "FROM v GROUP BY fp_id, source ORDER BY fp_id, source"),
    // n_dates counts distinct UTC days: Spark counts the p_date directory
    // key the DSv2 scan re-attaches; the oracle counts epoch-day integers
    // (bijective with the date string — no timezone-dependent strftime)
    "q76_dsv2_inventory" ->
      (s"$P SELECT lang, count(*) AS n_docs, count(DISTINCT ts_sec // 86400) AS n_dates, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM pages WHERE ilat >= 0 GROUP BY lang ORDER BY lang"),
    // oracle = FULL recompute; the Spark side refreshes incrementally
    // (stored snapshot-1 inventory + delta partitions only)
    "q75_incremental_inventory" ->
      (s"$P SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars " +
        "FROM pages GROUP BY lang ORDER BY lang"),
    "q59_footprint_overlap" ->
      (s"$P, pr AS (SELECT a.fp_id AS fp_a, b.fp_id AS fp_b, " +
        "greatest(a.ilon0, b.ilon0) AS x0, least(a.ilon1, b.ilon1) AS x1, " +
        "greatest(a.ilat0, b.ilat0) AS y0, least(a.ilat1, b.ilat1) AS y1 " +
        s"FROM ${Footprints.sqlValuesAs("a")} JOIN ${Footprints.sqlValuesAs("b")} " +
        "ON a.fp_id < b.fp_id AND least(a.ilon1, b.ilon1) >= greatest(a.ilon0, b.ilon0) " +
        "AND least(a.ilat1, b.ilat1) >= greatest(a.ilat0, b.ilat0)) " +
        "SELECT pr.fp_a AS fp_a, pr.fp_b AS fp_b, " +
        "CAST((x1 - x0 + 1) AS BIGINT) * (y1 - y0 + 1) AS area, count(p.url) AS n_pages " +
        "FROM pr LEFT JOIN pages p ON p.ilon BETWEEN x0 AND x1 AND p.ilat BETWEEN y0 AND y1 " +
        "GROUP BY pr.fp_a, pr.fp_b, area ORDER BY fp_a, fp_b"),
    // q92: net row-level changes of base -> upsert(+1000 on evens) ->
    // delete(%5==3), recomputed arithmetically. op semantics: D = was in
    // s1, gone in s3; I = new key surviving; U = content differs;
    // unchanged and insert-then-deleted keys net out.
    "q92_changelog" ->
      (s"$P, ch AS (" +
        "SELECT 'D' AS op, doc_id, lang, n_chars FROM pages WHERE doc_id % 3 <> 0 AND doc_id % 5 = 3 " +
        "UNION ALL SELECT 'I', doc_id, lang, n_chars + 1000 FROM pages " +
        "WHERE doc_id % 3 = 0 AND doc_id % 2 = 0 AND doc_id % 5 <> 3 " +
        "UNION ALL SELECT 'U', doc_id, lang, n_chars + 1000 FROM pages " +
        "WHERE doc_id % 3 <> 0 AND doc_id % 2 = 0 AND doc_id % 5 <> 3) " +
        "SELECT op, lang, count(*) AS n_keys, CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
        "FROM ch GROUP BY op, lang ORDER BY op, lang"),
    // q91: SAME arithmetic as q61 — the MOR upsert must be row-identical
    // to the COW merge (cross-implementation gate)
    "q91_mor_upsert" ->
      (s"$P, b AS (SELECT doc_id, lang, n_chars FROM pages WHERE doc_id % 3 <> 0), " +
        "up AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM pages WHERE doc_id % 2 = 0), " +
        "m AS (SELECT * FROM up UNION ALL SELECT * FROM b WHERE doc_id NOT IN (SELECT doc_id FROM up)) " +
        "SELECT lang, count(*) AS n_docs, count(DISTINCT doc_id) AS n_keys, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM m GROUP BY lang ORDER BY lang"),
    "q61_merge_upsert" ->
      (s"$P, b AS (SELECT doc_id, lang, n_chars FROM pages WHERE doc_id % 3 <> 0), " +
        "up AS (SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM pages WHERE doc_id % 2 = 0), " +
        "m AS (SELECT * FROM up UNION ALL SELECT * FROM b WHERE doc_id NOT IN (SELECT doc_id FROM up)) " +
        "SELECT lang, count(*) AS n_docs, count(DISTINCT doc_id) AS n_keys, " +
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM m GROUP BY lang ORDER BY lang"),
    // round-trip law makes the oracle exact: uncompact(compact(occupied))
    // == occupied, so the inventory equals the plain per-cell6 counts
    "q65_uncompact" ->
      (s"$P SELECT ${Pages.sqlCell("p.ilat", "p.ilon", 6)} AS cell6, count(*) AS n_pages " +
        "FROM pages p GROUP BY 1 ORDER BY cell6"),
    "q60_compact" -> {
      def c(l: Int) = Pages.sqlCell("p.ilat", "p.ilon", l)
      s"$P, c AS (SELECT DISTINCT ${c(6)} AS c6, ${c(5)} AS c5, ${c(4)} AS c4 FROM pages p), " +
        "f5 AS (SELECT c5, min(c4) AS c4 FROM c GROUP BY c5 HAVING count(*) = 4), " +
        "f4 AS (SELECT c4 FROM f5 GROUP BY c4 HAVING count(*) = 4), " +
        "k AS (SELECT CAST(6 AS INT) AS level, c6 AS cell_rm FROM c WHERE c5 NOT IN (SELECT c5 FROM f5) " +
        "UNION ALL SELECT CAST(5 AS INT), c5 FROM f5 WHERE c4 NOT IN (SELECT c4 FROM f4) " +
        "UNION ALL SELECT CAST(4 AS INT), c4 FROM f4) " +
        "SELECT level, cell_rm FROM k ORDER BY level, cell_rm"
    },
  ) ++ RelationalQueries.oracle ++ TextQueries.oracle ++ CorpusQueries.oracle ++
    SimilarityQueries.oracle ++ GeoSemanticQueries.oracle ++ CurationQueries.oracle ++
    GeoStatsQueries.oracle ++ Tiling.oracle ++ GraphQueries.oracle ++ MultiModal.oracle ++
    IndexStoreQueries.oracle ++ ClassifierQueries.oracle
}
