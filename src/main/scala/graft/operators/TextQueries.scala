package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis + deduplication operators over the `documents` table —
  * the training-data-pipeline surface: token stats, quality scoring,
  * language-ID heuristic, document fingerprinting (rolling hash), exact
  * dedup, MinHash+LSH near-dup candidate pairs with Jaccard verification,
  * and SimHash.
  *
  * Everything is SQL-mirrorable by construction: token hashes are 60-bit
  * ints derived from md5 hex (identical in Spark and DuckDB), ratios are
  * floor-scaled integers, and all lambdas use only operations both engines
  * implement identically. All hashing stays inside whole-stage codegen
  * (built-in md5/conv — no UDFs).
  */
object TextQueries {

  private def docs(spark: SparkSession, sfDir: String) =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** 60-bit token hash from the md5 hex prefix — portable across engines.
    * Shared (with its SQL twin below) by every operator needing a
    * deterministic cross-engine hash — do NOT re-derive the idiom. */
  private[operators] def tokHash(t: Column, salt: String = ""): Column =
    conv(substring(md5(if (salt.isEmpty) t else concat(lit(salt), t)), 1, 15), 16, 10).cast("long")
  private[operators] def sqlTokHash(t: String, salt: String = ""): String =
    if (salt.isEmpty) s"CAST(('0x' || substr(md5($t), 1, 15)) AS BIGINT)"
    else s"CAST(('0x' || substr(md5('$salt' || $t), 1, 15)) AS BIGINT)"

  /** B11 — token counting per language. */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("n_tok", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"),
        min(col("n_tok")).as("min_tok"), max(col("n_tok")).as("max_tok"))
      .orderBy(col("lang"))

  /** Quality scoring: stopword-ratio buckets (integer permille, floor). */
  def qualityBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val sw = size(filter(toks, t => t === "the" || t === "a"))
    val swrM = floor(sw.cast("long") * 1000 / size(toks)).cast("long")
    docs(spark, sfDir)
      .withColumn("swr_m", swrM)
      .withColumn("bucket",
        when(col("swr_m") < 50, "low").when(col("swr_m") < 80, "mid").otherwise("high"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), min(col("swr_m")).as("min_swr"),
        max(col("swr_m")).as("max_swr"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Language-ID heuristic (marker-token hits) vs the labeled lang. */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val padded = concat(lit(" "), col("text"), lit(" "))
    val pred = when(instr(padded, " the ") > 0 || instr(padded, " a ") > 0, "en")
      .otherwise("und")
    docs(spark, sfDir)
      .withColumn("predicted", pred)
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Document fingerprinting: rolling polynomial hash over token hashes,
    * mod 1e9+7 (no overflow in either engine). */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    val fp = aggregate(
      transform(split(col("text"), " "), t => tokHash(t)),
      lit(0L), (acc, h) => (acc * 31 + h) % 1000000007L)
    docs(spark, sfDir)
      .withColumn("fp", fp)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_fp"))
      .orderBy(col("lang"))
  }

  /** Exact dedup via content hash: per (lang, source) duplicate stats. */
  def exactDedup(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("h", md5(col("text")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_dups"))
      .orderBy(col("lang"))

  /** 3-gram shingles of the token list (docs with >= 3 tokens). */
  private def withShingles(d: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    d.withColumn("n_tok", size(toks))
      .filter(col("n_tok") >= 3)
      .withColumn("sh", transform(sequence(lit(0), col("n_tok") - 3),
        j => concat_ws(" ", slice(toks, j + 1, lit(3)))))
  }

  /** Raw 60-bit shingle hashes per doc (`h0raw`, docs with >= 3 tokens):
    * ONE codegen'd kernel call per document (`shingle_hashes`) instead of
    * a per-shingle md5->hex->conv Column chain — identical values (the
    * kernel replicates the conv(substring(md5 ..)) arithmetic bit-exactly,
    * oracle-gated through q28/q29/q44/q47). */
  private[operators] def withShingleHashes(d: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    d.withColumn("h0raw", graft.functions.GraftFunctions.shingle_hashes(col("text")))
      .filter(size(col("h0raw")) > 0)
  }

  /** 8 signatures -> 4 bands x 2 rows. The banding s-curve at the 0.2
    * Jaccard verify threshold: P(candidate | j) = 1 - (1 - j^2)^4, i.e.
    * 0.59 at j=0.45 and 0.92 at j=0.7 (round 1 shipped 2 bands x 2 rows —
    * demo-grade 0.36/0.76; more bands sharpen recall at the cost of one
    * extra shuffle row per band per doc). */
  private val NumSigs = 8
  final val NumBands = NumSigs / 2
  /** Universal-hash MinHash families over ONE base md5 hash per shingle:
    * h_i(x) = (A(i) * (h0(x) mod P) + B(i)) mod P. One md5 per shingle
    * total (not per family) — the md5 is the cost driver at scale. */
  private val P = 1000000007L
  private val HashA = Array(131L, 137L, 139L, 149L, 163L, 167L, 173L, 179L)
  private val HashB = Array(17L, 19L, 23L, 29L, 41L, 43L, 47L, 53L)

  /** MinHash signatures (8 hash families) over 3-gram shingles. */
  def minhashSigs(spark: SparkSession, sfDir: String): DataFrame =
    minhashSigsUnsorted(spark, sfDir).orderBy(col("doc_id"))

  private def minhashSigsUnsorted(spark: SparkSession, sfDir: String): DataFrame = {
    val base = withShingleHashes(docs(spark, sfDir))
      .withColumn("h0", transform(col("h0raw"), h => h % P))
    val sigs = (0 until NumSigs).map(i =>
      array_min(transform(col("h0"), h => (h * HashA(i) + HashB(i)) % P)).as(s"s$i"))
    base.select(col("doc_id") +: sigs: _*)
  }

  /** MinHash + LSH banding (4 bands x 2 rows) -> candidate pairs ->
    * exact Jaccard verification over shingle sets. The full near-dup
    * pipeline: at scale the band self-join is an equi-join on the band
    * hash (shuffle on band key), never an all-pairs product.
    *
    * q29's declared output orders by (d1, d2); the aggregate consumers
    * (q58/q116/q118/q120) take the UNSORTED verified pairs via
    * [[lshNearDupPairsAnd]] — they re-key immediately, so the r5 sort
    * before the pair cache was a dead range exchange + sampling job on
    * their paths (guide §2.4: an orderBy used only for presentation). */
  def lshNearDupPairs(spark: SparkSession, sfDir: String, minJacM: Int = 200): DataFrame =
    lshNearDupPairsAnd(spark, sfDir, minJacM)._1.orderBy(col("d1"), col("d2"))

  /** (unsorted verified pairs, shingle-set frame) — both persisted and
    * CacheBag-registered. `keepSh` callers (q116) reuse the shingle sets
    * for their own verification stage instead of re-running the
    * shingle+hash kernel over the corpus a second time; others get the
    * cache dropped as soon as the pairs are materialized. */
  private[operators] def lshNearDupPairsAnd(spark: SparkSession, sfDir: String,
      minJacM: Int = 200, keepSh: Boolean = false): (DataFrame, DataFrame) = {
    // sig and shingle frames are reused in multiple plan branches (four
    // bands, two pair sides) — persist so the shingle+hash pipeline runs
    // once, not once per branch.
    val sig = (0 until NumBands).foldLeft(minhashSigsUnsorted(spark, sfDir)) { (df, b) =>
      df.withColumn(s"b$b", md5(concat(
        col(s"s${2 * b}").cast("string"), lit(":"), col(s"s${2 * b + 1}").cast("string"))))
    }.persist()
    // one scan of the cached sigs per join side (posexplode of the band
    // array) instead of an r5 4-way union — same (doc_id, bi, band) rows
    val bands = sig.select(col("doc_id"), posexplode(
        array((0 until NumBands).map(b => col(s"b$b")): _*)).as(Seq("bi", "band")))
    val pairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bi") === col("y.bi") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val sh = withShingleHashes(docs(spark, sfDir))
      .select(col("doc_id"), array_distinct(col("h0raw")).as("shd"))
      .persist()
    val inter = size(array_intersect(col("x.shd"), col("y.shd")))
    val uni = size(col("x.shd")) + size(col("y.shd")) - inter
    val out = pairs
      .join(sh.as("x"), col("d1") === col("x.doc_id"))
      .join(sh.as("y"), col("d2") === col("y.doc_id"))
      .withColumn("jac_m", floor(inter.cast("long") * 1000 / uni).cast("long"))
      .filter(col("jac_m") >= minJacM)
      .select(col("d1"), col("d2"), col("jac_m"))
      .persist()
    // Materialize the pair result (stays DISTRIBUTED — its size is
    // data-dependent and must not be collected to the driver), then
    // release the big shingle/signature caches. Only the far smaller pair
    // cache outlives the call, registered with CacheBag — the driver's
    // per-query release point (note: q29's public return is an orderBy
    // WRAPPER over this cache, so unpersisting the returned frame would
    // NOT release it; CacheBag is the release path).
    out.count()
    sig.unpersist(false)
    if (keepSh) graft.util.CacheBag.register(sh) else sh.unpersist(false)
    (graft.util.CacheBag.register(out), sh)
  }

  /** 16-bit SimHash over token hashes (majority vote per bit). */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("th", transform(col("toks"), t => tokHash(t)))
    val sh = (0 until 16).map { j =>
      when(size(filter(col("th"), h => shiftright(h, j).bitwiseAND(lit(1L)) === 1L)) * 2
        >= col("n_tok"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    d.withColumn("simhash16", sh)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), col("lang"), col("simhash16"))
      .orderBy(col("doc_id"))
  }

  /** Minhash families for the q44 blocking band — disjoint from the
    * q28/q29 families so the two dedup paths stay independent. */
  private val BlockA = Array(151L, 157L)
  private val BlockB = Array(31L, 37L)

  /** Band-blocked n-gram Jaccard dedup: the single cheapest candidate
    * generator — ONE MinHash band (2 rows) as the blocking key, all pairs
    * within a block, exact Jaccard verify at a low threshold (0.15).
    *
    * The round-1 version blocked on (lang, source): that key has FIXED
    * cardinality, so block size grows with the corpus and the within-block
    * all-pairs term is quadratic (the docstring's "block sizes are
    * bounded" claim was false at scale — VERDICT r1). A MinHash band key's
    * cardinality grows with content diversity: block count measured 479 →
    * 4710 from sf0.01 → sf0.1 (max block 7 rows), and near-dup recall of
    * true jac>=0.15 pairs is 0.84/0.95 — blocking work is ~linear in n. */
  def blockedJaccard(spark: SparkSession, sfDir: String, minJacM: Int = 150): DataFrame = {
    val base = withShingleHashes(docs(spark, sfDir))
      .withColumn("h0", col("h0raw"))
    val sigs = (0 until BlockA.length).map(i =>
      array_min(transform(col("h0"), h => ((h % P) * BlockA(i) + BlockB(i)) % P)).as(s"s$i"))
    // blocked frame reused on both join sides — persist so shingling and
    // hashing run once, not once per branch
    val blocked = base
      .select(Seq(col("doc_id"), col("lang"),
        array_distinct(col("h0")).as("shd")) ++ sigs: _*)
      .withColumn("band",
        md5(concat(col("s0").cast("string"), lit(":"), col("s1").cast("string"))))
      .persist()
    val inter = size(array_intersect(col("x.shd"), col("y.shd")))
    val uni = size(col("x.shd")) + size(col("y.shd")) - inter
    val out = blocked.as("x").join(blocked.as("y"),
        col("x.band") === col("y.band") && col("x.doc_id") < col("y.doc_id"))
      .withColumn("jac_m", floor(inter.cast("long") * 1000 / uni).cast("long"))
      .filter(col("jac_m") >= minJacM)
      .select(col("x.lang").as("lang"), col("x.doc_id").as("d1"),
        col("y.doc_id").as("d2"), col("jac_m"))
      .orderBy(col("lang"), col("d1"), col("d2"))
      .persist()
    out.count() // materialize (distributed) before releasing the block cache
    blocked.unpersist(false)
    graft.util.CacheBag.register(out)
  }

  final val WinnowWindow = 4

  /** Winnowing fingerprints (MOSS-style): the distinct local minima of the
    * shingle-hash sequence over a sliding window — position-robust document
    * fingerprints whose count is ~2/(w+1) of the shingle count. Two docs
    * sharing winnowed prints share content even under edits. */
  def winnowFingerprints(spark: SparkSession, sfDir: String): DataFrame = {
    val w = WinnowWindow
    // let-binding via a singleton transform: the hash array is evaluated
    // ONCE per row as the lambda argument. Referencing the md5-transform
    // expression directly inside the window lambda lets Catalyst inline
    // it per window position — O(shingles^2) md5 calls (measured 113s at
    // sf0.1 vs ~2s for this shape).
    val hExpr = transform(col("h0raw"), h => h % P)
    val printsExpr = array_distinct(flatten(transform(array(hExpr), hh =>
      transform(sequence(lit(0), size(hh) - w), i => array_min(slice(hh, i + 1, lit(w)))))))
    val base = withShingleHashes(docs(spark, sfDir))
      .filter(size(col("h0raw")) >= w) // n shingles >= window
      .withColumn("prints", printsExpr)
    base
      .select(col("lang"), col("doc_id"), explode(col("prints")).as("print"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_prints"),
        countDistinct(col("print")).as("n_distinct_prints"))
      .orderBy(col("lang"))
  }

  /** BPE-ish token counting: alpha runs, digit runs, and single other
    * chars each count as one token (regex shared with the oracle). */
  def regexTokens(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .withColumn("n_re", size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
      .withColumn("n_ws", size(split(col("text"), " ")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_re")).as("sum_re_tok"),
        sum(col("n_ws")).as("sum_ws_tok"))
      .orderBy(col("lang"))

  /** TF-IDF term ranking in pure integer arithmetic: tf = in-doc term
    * count, df = corpus document frequency, score = tf*1e6 div df (integer
    * division — both engines floor). The df aggregation is the classic
    * two-level shape: the token-grouped side shrinks to vocabulary size
    * (broadcastable for real corpora's ~1e6-term vocabularies), the tf
    * side shuffles once on token for the join. The doc filter applies
    * AFTER df so idf reflects the whole corpus. */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, topK: Int = 3): DataFrame = {
    val tok = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    // df stays CORPUS-wide; tf only needs the docs being ranked, so the
    // doc filter pushes into the tf branch — the token join then carries
    // |ranked docs| x tokens rows, not the whole corpus, and the hot
    // stopword keys ("the" appears in every doc) can't skew the shuffle
    val tf = tok.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("token"))
    tf.join(dfreq, Seq("token"))
      .withColumn("score_ppm", expr("tf * 1000000 div df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("rnk"), col("token"), col("tf"), col("df"),
        col("score_ppm"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** The composed corpus-cleaning pipeline — what a training-data run
    * actually ships: length/quality gate -> language allowlist -> exact
    * dedup (keep the smallest doc_id per content hash) -> deterministic
    * hash sample -> per-(lang, source) inventory of the surviving corpus.
    * Every stage is a narrow transformation or one aggregation; the only
    * shuffles are the dedup groupBy (on the content hash — uniform) and
    * the final inventory agg. All stages reuse the engine's primitives
    * (token counts, md5 content hash, md5-permille sampling), and the
    * whole chain is mirrored in one DuckDB CTE pipeline. */
  def cleanCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = docs(spark, sfDir)
      .withColumn("n_tok", size(split(col("text"), " ")))
      // quality gate: degenerate docs out (token count + char bounds)
      .filter(col("n_tok") >= 5 && col("n_tok") <= 10000 && col("n_chars") < 100000)
      // language allowlist
      .filter(col("lang").isin("en", "de", "fr"))
    // exact dedup: keep the smallest doc_id per content hash
    val deduped = d
      .groupBy(md5(col("text")).as("h"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("source"), col("n_chars")),
        col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.source").as("source"), col("r.n_chars").as("n_chars"))
    // deterministic 80% sample on the doc-id hash (reproducible, map-side)
    deduped
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 1000 < 800)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"), col("source"))
  }

  final val ChunkWords = 3

  /** q88 — chunk-level exact dedup (the CCNet/RefinedWeb paragraph-dedup
    * shape, adapted to the newline-free fixture corpus: a "paragraph" is a
    * fixed window of [[ChunkWords]] tokens). Every document is split into
    * contiguous token chunks; a chunk occurring anywhere earlier in the
    * corpus (order = (doc_id, chunk_idx), the crawl order) is REMOVED and
    * only its first occurrence kept — per doc the report is chunks seen /
    * kept / surviving token count.
    *
    * Scale shape: chunking is a pure map-side higher-order projection
    * (one `transform`+`slice` over the token array — no explode until the
    * chunk rows are needed); corpus-wide first-occurrence ranking is ONE
    * shuffle keyed on the chunk text (high cardinality — vocabulary^w),
    * then one agg back to doc_id. No driver state, no collect; at 100 TB
    * the chunk key would hash to a 128-bit digest before the exchange,
    * which changes bytes-on-wire, not the plan. */
  def chunkDedup(spark: SparkSession, sfDir: String, width: Int = ChunkWords): DataFrame = {
    val chunks = expr(
      s"transform(sequence(0, int((size(split(text, ' ')) - 1) div $width)), " +
        s"i -> array_join(slice(split(text, ' '), i * $width + 1, $width), ' '))")
    val w = Window.partitionBy(col("chunk")).orderBy(col("doc_id"), col("cidx"))
    docs(spark, sfDir)
      .select(col("doc_id"), posexplode(chunks).as(Seq("cidx", "chunk")))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_chunks"),
        sum(when(col("rn") === 1, size(split(col("chunk"), " ")).cast("long"))
          .otherwise(0L)).as("kept_tokens"))
      .orderBy(col("doc_id"))
  }

  /** q89 — per-document repetition signals (the Gopher-rules shape:
    * repetitious documents are low-quality): most-frequent-token share and
    * duplicate-2-gram share, both as floor permille (integer — FIXTURES
    * §3).
    *
    * Deliberately ZERO-SHUFFLE (gated in PlanShapeSpec): both signals are
    * per-row array computations — the mode count is the longest run in the
    * SORTED token array (one `aggregate` lambda), the duplicate-2-gram
    * count is `n_grams - n_distinct_grams` — so the whole query is a
    * projection; the only exchange is the final presentation sort. The
    * oracle computes the same numbers the relational way (explode +
    * groupBy) — agreement proves the lambda formulation. Documents with
    * fewer than 2 tokens carry no 2-gram signal and are excluded (the
    * oracle's inner join drops them identically). */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir)
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .filter(size(col("ws")) >= 2)
      .selectExpr(
        "doc_id",
        "CAST(size(ws) AS BIGINT) AS n_tok",
        "aggregate(array_sort(ws), " +
          "named_struct('prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT), 'best', CAST(0 AS BIGINT)), " +
          "(acc, x) -> named_struct('prev', x, " +
          "'run', IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)), " +
          "'best', greatest(acc.best, IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1, CAST(1 AS BIGINT)))), " +
          "acc -> acc.best) AS topc",
        "transform(sequence(0, size(ws) - 2), " +
          "i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2))) AS grams")
      .selectExpr("doc_id", "n_tok",
        "topc * 1000 div n_tok AS top_word_pm",
        "CAST(size(grams) - size(array_distinct(grams)) AS BIGINT) * 1000 div size(grams) AS dup2_pm")
      .orderBy(col("doc_id"))

  /** q97 — sparse TF-IDF document similarity (the IR complement to the
    * dense-embedding cosine q96): per query doc, the top-3 most similar
    * docs by the SPARSE weighted dot — sim(a, b) = Σ_t w(a,t)·w(b,t) with
    * q57's integer weight w = tf·1e6 div df. The pair space is generated
    * by the shared-TOKEN equi-join (never an all-pairs product): at scale
    * the shuffle keys on token, and the query side is the small filtered
    * subset. All-integer (products ≤ ~1e17), vec_id-tiebroken.
    *
    * Two scale disciplines (verdict r4 #2):
    *  - ranking through [[SimilarityQueries.topKByGroup]]'s bounded
    *    partial top-k aggregate (map-side combinable), never a
    *    qid-partitioned window holding corpus-scale rows.
    *  - df-cap pruning (`dfCapPm`): a token appearing in more than
    *    dfCapPm‰ of the corpus carries near-floor weight yet its posting
    *    list — the token-join's skew hotspot — is corpus-proportional;
    *    capping drops it BEFORE the join, bounding every per-token
    *    candidate list by construction. At web scale a 500‰ cap is the
    *    production setting; the oracle-gated query runs uncapped
    *    (dfCapPm = 1000 keeps every token) because the tiny fixture
    *    grammar (31 tokens, median df ≈ 0.8·n) would degenerate under
    *    any real cap — the monotone-subsetting law is ST-gated instead. */
  def tfidfPairSim(spark: SparkSession, sfDir: String, topK: Int = 3,
      nQueries: Int = 20, dfCapPm: Int = 1000): DataFrame = {
    val tok = docs(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    // r6 (guide §2.3 — aggregate before you shuffle): tf already holds one
    // row per (doc, token), so df = its per-token row count; deriving it
    // from the CACHED tf drops the second corpus-wide explode+scan and
    // countDistinct's extra dedup exchange.
    val tf = tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      .persist()
    graft.util.CacheBag.register(tf)
    val nDocs = docs(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * 1000 <= col("n_docs") * dfCapPm)
    val w = tf.join(dfreq, Seq("token"))
      .select(col("doc_id"), col("token"), expr("tf * 1000000 div df").as("w"))
      .persist()
    graft.util.CacheBag.register(w)
    // Materialize-then-release (guide §5, the q29/q41 pattern): every
    // downstream consumer reads only w, so once w is materialized the tf
    // posting cache is dead weight — peak memory holds ONE
    // posting-list-sized cache, not two. (tf stays CacheBag-registered:
    // double-unpersist is a no-op, and the bag remains the exception-path
    // cleanup.)
    w.count()
    tf.unpersist(false)
    val q = w.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("token"), col("w").as("qw"))
    val sims = q
      .join(w.select(col("doc_id").as("did"), col("token"), col("w")), Seq("token"))
      .filter(col("qid") =!= col("did"))
      .groupBy(col("qid"), col("did"))
      .agg(sum(col("qw") * col("w")).as("sim"))
    // (-sim, did) lexicographic-smallest ≡ ORDER BY sim DESC, did ASC;
    // sim ≤ ~1e17 so the negation is overflow-safe
    SimilarityQueries.topKByGroup(sims, "qid", negate(col("sim")), col("did"), topK)
      .select(col("qid"), col("rnk"), col("b").as("did"), negate(col("a")).as("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  // ---- oracle twins -------------------------------------------------------

  private[operators] val shCte =
    "t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents), " +
      "s AS (SELECT doc_id, lang, list_transform(range(len(toks) - 2), " +
      "j -> array_to_string(list_slice(toks, j + 1, j + 3), ' ')) AS sh FROM t WHERE len(toks) >= 3)"

  private def sqlSig(i: Int): String =
    s"list_min(list_transform(sh, x -> ((${sqlTokHash("x")} % $P) * ${HashA(i)} + ${HashB(i)}) % $P)) AS s$i"

  /** Shared CTE chain producing the verified near-dup pair table `j`
    * (d1, d2, jac_m) — the oracle twin of `lshNearDupPairs`, reused by
    * q29 and by the connected-components oracle (GraphQueries). */
  private[operators] val lshPairsCte: String =
    s"$shCte, m AS (SELECT doc_id, list_distinct(list_transform(sh, x -> ${sqlTokHash("x")})) AS shd, " +
      s"${(0 until NumSigs).map(sqlSig).mkString(", ")} FROM s), " +
      "b AS (" + (0 until NumBands).map(b =>
        s"SELECT doc_id, md5(CAST(s${2 * b} AS VARCHAR) || ':' || CAST(s${2 * b + 1} AS VARCHAR)) AS band, $b AS bi FROM m")
        .mkString(" UNION ALL ") + "), " +
      "pairs AS (SELECT DISTINCT b1.doc_id AS d1, b2.doc_id AS d2 FROM b b1 " +
      "JOIN b b2 ON b1.band = b2.band AND b1.bi = b2.bi AND b1.doc_id < b2.doc_id), " +
      "j AS (SELECT d1, d2, CAST(floor(1000.0 * len(list_intersect(m1.shd, m2.shd)) / " +
      "(len(m1.shd) + len(m2.shd) - len(list_intersect(m1.shd, m2.shd)))) AS BIGINT) AS jac_m " +
      "FROM pairs JOIN m m1 ON m1.doc_id = d1 JOIN m m2 ON m2.doc_id = d2)"

  val oracle: Map[String, String] = Map(
    "q97_tfidf_pairs" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token), " +
        "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token), " +
        "w AS (SELECT tf.doc_id, tf.token, CAST(tf.tf * 1000000 // df.df AS BIGINT) AS w " +
        "FROM tf JOIN df ON tf.token = df.token), " +
        "q AS (SELECT * FROM w WHERE doc_id < 20), " +
        "p AS (SELECT q.doc_id AS qid, w.doc_id AS did, CAST(sum(q.w * w.w) AS BIGINT) AS sim " +
        "FROM q JOIN w ON q.token = w.token AND q.doc_id <> w.doc_id GROUP BY 1, 2), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rnk FROM p) " +
        "SELECT qid, CAST(rnk AS INT) AS rnk, did, sim FROM r WHERE rnk <= 3 ORDER BY qid, rnk"),
    "q88_chunk_dedup" ->
      (s"WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word, " +
        "generate_subscripts(string_split(text, ' '), 1) AS ord FROM documents), " +
        s"c AS (SELECT doc_id, (ord - 1) // $ChunkWords AS cidx, string_agg(word, ' ' ORDER BY ord) AS chunk " +
        s"FROM w GROUP BY doc_id, (ord - 1) // $ChunkWords), " +
        "r AS (SELECT doc_id, chunk, row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn FROM c) " +
        "SELECT doc_id, count(*) AS n_chunks, " +
        "CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks, " +
        "CAST(sum(CASE WHEN rn = 1 THEN len(string_split(chunk, ' ')) ELSE 0 END) AS BIGINT) AS kept_tokens " +
        "FROM r GROUP BY doc_id ORDER BY doc_id"),
    "q89_repetition" ->
      ("WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word, " +
        "generate_subscripts(string_split(text, ' '), 1) AS ord FROM documents), " +
        "n AS (SELECT doc_id, count(*) AS n_tok FROM w GROUP BY doc_id), " +
        "tw AS (SELECT doc_id, max(c) AS topc FROM " +
        "(SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word) GROUP BY doc_id), " +
        "g AS (SELECT a.doc_id, a.word || ' ' || b.word AS gram FROM w a " +
        "JOIN w b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1), " +
        "dg AS (SELECT doc_id, count(*) - count(DISTINCT gram) AS dup2, count(*) AS n2 FROM g GROUP BY doc_id) " +
        "SELECT n.doc_id AS doc_id, CAST(n.n_tok AS BIGINT) AS n_tok, " +
        "CAST(tw.topc * 1000 // n.n_tok AS BIGINT) AS top_word_pm, " +
        "CAST(dg.dup2 * 1000 // dg.n2 AS BIGINT) AS dup2_pm " +
        "FROM n JOIN tw ON n.doc_id = tw.doc_id JOIN dg ON n.doc_id = dg.doc_id ORDER BY doc_id"),
    "q23_token_stats" ->
      ("SELECT lang, count(*) AS n_docs, CAST(sum(len(string_split(text,' '))) AS BIGINT) AS sum_tok, " +
        "min(len(string_split(text,' '))) AS min_tok, max(len(string_split(text,' '))) AS max_tok " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q24_quality_buckets" ->
      ("WITH q AS (SELECT lang, CAST(floor(1000.0 * len(list_filter(string_split(text,' '), " +
        "t -> t IN ('the','a'))) / len(string_split(text,' '))) AS BIGINT) AS swr_m FROM documents) " +
        "SELECT lang, CASE WHEN swr_m < 50 THEN 'low' WHEN swr_m < 80 THEN 'mid' ELSE 'high' END AS bucket, " +
        "count(*) AS n_docs, min(swr_m) AS min_swr, max(swr_m) AS max_swr " +
        "FROM q GROUP BY 1, 2 ORDER BY lang, bucket"),
    "q25_langid" ->
      ("SELECT lang, CASE WHEN strpos(' '||text||' ', ' the ') > 0 OR strpos(' '||text||' ', ' a ') > 0 " +
        "THEN 'en' ELSE 'und' END AS predicted, count(*) AS n_docs " +
        "FROM documents GROUP BY 1, 2 ORDER BY lang, predicted"),
    "q26_fingerprint" ->
      (s"WITH f AS (SELECT lang, list_reduce(list_concat([CAST(0 AS BIGINT)], " +
        s"list_transform(string_split(text,' '), t -> ${sqlTokHash("t")})), " +
        "(a, b) -> (a * 31 + b) % 1000000007) AS fp FROM documents) " +
        "SELECT lang, count(*) AS n_docs, count(DISTINCT fp) AS n_fp FROM f GROUP BY lang ORDER BY lang"),
    "q27_exact_dedup" ->
      ("SELECT lang, count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct, " +
        "count(*) - count(DISTINCT md5(text)) AS n_dups FROM documents GROUP BY lang ORDER BY lang"),
    "q28_minhash_sigs" ->
      (s"WITH $shCte SELECT doc_id, ${(0 until NumSigs).map(sqlSig).mkString(", ")} " +
        "FROM s ORDER BY doc_id"),
    "q29_lsh_neardup" ->
      (s"WITH $lshPairsCte SELECT d1, d2, jac_m FROM j WHERE jac_m >= 200 ORDER BY d1, d2"),
    "q30_simhash" ->
      (s"WITH d AS (SELECT doc_id, lang, len(string_split(text,' ')) AS n_tok, " +
        s"list_transform(string_split(text,' '), t -> ${sqlTokHash("t")}) AS th FROM documents) " +
        "SELECT doc_id, lang, CAST(" +
        (0 until 16).map(j =>
          s"(CASE WHEN 2 * len(list_filter(th, h -> ((h >> $j) & 1) = 1)) >= n_tok THEN ${1L << j} ELSE 0 END)")
          .mkString(" + ") +
        " AS BIGINT) AS simhash16 FROM d WHERE doc_id < 200 ORDER BY doc_id"),
    "q44_blocked_jaccard" ->
      (s"WITH $shCte, " +
        s"m AS (SELECT doc_id, lang, list_distinct(list_transform(sh, x -> ${sqlTokHash("x")})) AS shd, " +
        (0 until BlockA.length).map(i =>
          s"list_min(list_transform(sh, x -> ((${sqlTokHash("x")} % $P) * ${BlockA(i)} + ${BlockB(i)}) % $P)) AS s$i")
          .mkString(", ") + " FROM s), " +
        "b AS (SELECT doc_id, lang, shd, md5(CAST(s0 AS VARCHAR) || ':' || CAST(s1 AS VARCHAR)) AS band FROM m), " +
        "p AS (SELECT x.lang AS lang, x.doc_id AS d1, y.doc_id AS d2, " +
        "CAST(floor(1000.0 * len(list_intersect(x.shd, y.shd)) / " +
        "(len(x.shd) + len(y.shd) - len(list_intersect(x.shd, y.shd)))) AS BIGINT) AS jac_m " +
        "FROM b x JOIN b y ON x.band = y.band AND x.doc_id < y.doc_id) " +
        "SELECT lang, d1, d2, jac_m FROM p WHERE jac_m >= 150 ORDER BY lang, d1, d2"),
    "q47_winnow" ->
      (s"WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents), " +
        "s AS (SELECT doc_id, lang, list_transform(range(len(toks) - 2), " +
        s"j -> ${sqlTokHash("array_to_string(list_slice(toks, j + 1, j + 3), ' ')")} % $P) AS h " +
        "FROM t WHERE len(toks) >= 3), " +
        s"p AS (SELECT doc_id, lang, unnest(list_distinct(list_transform(range(len(h) - ${WinnowWindow - 1}), " +
        s"i -> list_min(list_slice(h, i + 1, i + $WinnowWindow))))) AS prnt FROM s WHERE len(h) >= $WinnowWindow) " +
        "SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_prints, " +
        "count(DISTINCT prnt) AS n_distinct_prints FROM p GROUP BY lang ORDER BY lang"),
    "q62_clean_corpus" ->
      ("WITH g AS (SELECT doc_id, lang, source, n_chars, text FROM documents " +
        "WHERE len(string_split(text, ' ')) BETWEEN 5 AND 10000 AND n_chars < 100000 " +
        "AND lang IN ('en', 'de', 'fr')), " +
        "dd AS (SELECT arg_min(doc_id, doc_id) AS doc_id, arg_min(lang, doc_id) AS lang, " +
        "arg_min(source, doc_id) AS source, arg_min(n_chars, doc_id) AS n_chars " +
        "FROM g GROUP BY md5(text)), " +
        "s AS (SELECT * FROM dd WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < 800) " +
        "SELECT lang, source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
        "min(doc_id) AS min_doc, max(doc_id) AS max_doc " +
        "FROM s GROUP BY lang, source ORDER BY lang, source"),
    "q57_tfidf" ->
      ("WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents), " +
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token), " +
        "df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token), " +
        "s AS (SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df, " +
        "CAST((tf.tf * 1000000) // df.df AS BIGINT) AS score_ppm " +
        "FROM tf JOIN df ON tf.token = df.token WHERE tf.doc_id < 50), " +
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_ppm DESC, token) AS rnk FROM s) " +
        "SELECT doc_id, CAST(rnk AS INT) AS rnk, token, tf, df, score_ppm " +
        "FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"),
    "q45_regex_tokens" ->
      ("SELECT lang, count(*) AS n_docs, " +
        "CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS sum_re_tok, " +
        "CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_ws_tok " +
        "FROM documents GROUP BY lang ORDER BY lang"),
  )
}
