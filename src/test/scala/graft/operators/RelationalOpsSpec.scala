package graft.operators

import org.apache.spark.sql.functions._
import graft.testutil.SparkTestBase

/** Semantic invariants for the round-2 relational additions (sessionize,
  * pivot, stratified sample) beyond the DuckDB hash gate. */
class RelationalOpsSpec extends SparkTestBase {

  test("sessionize: events partition into sessions exactly (counts conserve)") {
    val sess = RelationalQueries.sessionize(spark, sf0001)
    val nFromSessions = sess.agg(sum(col("n_events"))).head.getLong(0)
    val nEvents = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(nFromSessions === nEvents)
  }

  test("sessionize: no intra-session gap exceeds 30 minutes") {
    // Rebuild per-event session assignment and check the defining property:
    // consecutive events in one session are <= 1800s apart, and the first
    // event of session k+1 is > 1800s after the last event of session k.
    val sess = RelationalQueries.sessionize(spark, sf0001)
      .select(col("user_id"), col("session_idx"), col("t0"), col("t1"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getLong(1)))
    for ((_, rows) <- sess; Array(a, b) <- rows.toArray.sliding(2)) {
      assert(b.getLong(2) - a.getLong(3) > 1800,
        s"sessions ${a.getLong(1)} and ${b.getLong(1)} should have been merged")
    }
  }

  test("pivot: per-type counts sum to plain groupBy totals") {
    val piv = RelationalQueries.eventPivot(spark, sf0001)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivTotal = piv.agg(sum(types.map(t => col(s"n_$t")).reduce(_ + _))).head.getLong(0)
    val plain = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("user_id") < 50).count()
    assert(pivTotal === plain)
  }

  test("stratified sample: observed rates stay near target permille") {
    val tot = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    val samp = RelationalQueries.stratifiedSample(spark, sf0001)
    val joined = samp.join(tot, "lang")
      .select(col("lang"), col("n_sampled"), col("n_total")).collect()
    val target = Map("en" -> 0.10, "de" -> 0.25, "fr" -> 0.50)
    for (r <- joined) {
      val rate = r.getLong(1).toDouble / r.getLong(2)
      val want = target.getOrElse(r.getString(0), 1.0)
      // md5 permille is uniform; at sf0.001 strata are ~200 docs, allow wide
      // tolerance (binomial sd ~ 3%); rate=1.0 strata must be exact.
      assert(math.abs(rate - want) < 0.12, s"${r.getString(0)}: $rate vs $want")
    }
  }

  test("approx percentiles within 1% rank error of exact") {
    val approx = RelationalQueries.valuePercentilesApprox(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // exact rank window per event type (integer cents domain)
    val e = spark.read.parquet(s"$sf001/events.parquet")
      .withColumn("value_c", round(col("value") * 100).cast("long"))
    val byType = e.select(col("event_type"), col("value_c")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted)
    for ((t, vals) <- byType; (got, q) <- Seq((approx(t)._1, 0.5), (approx(t)._2, 0.9))) {
      val rank = vals.indexWhere(_ >= got).toDouble / vals.length
      assert(math.abs(rank - q) <= 0.011, s"$t q=$q: approx $got at rank $rank")
    }
  }

  test("typed Dataset pipeline parity: latestPerSourceTyped == untyped q19") {
    val typed = TypedQueries.latestPerSourceTyped(spark, sf0001).collect()
      .map(r => (r.source, r.nDocs, r.latestDoc, r.latestTs)).toSeq
    val untyped = RelationalQueries.latestPerSource(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(typed === untyped)
  }

  test("typed mapGroups lang stats match the untyped aggregate") {
    val typed = TypedQueries.langStatsTyped(spark, sf0001).collect()
      .map(r => (r.lang, r.nDocs, r.sumChars)).toSeq
    val untyped = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("n_chars") >= 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("s"))
      .orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(typed === untyped)
  }

  test("q73 quartiles: closed-form ntile == window ntile, row-identical") {
    // the r6 distributed-rank rewrite must reproduce the ntile(4) window
    // bit-for-bit — same totals, same bucket boundaries, all four rows
    import org.apache.spark.sql.expressions.Window
    val got = RelationalQueries.custQuartiles(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    graft.util.CacheBag.release()
    val totals = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("total_c"))
    val w = Window.orderBy(col("total_c"), col("o_custkey"))
    val want = totals.withColumn("quartile", ntile(4).over(w))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_cust"), min(col("total_c")).as("min_c"),
        max(col("total_c")).as("max_c"), sum(col("total_c")).as("sum_c"))
      .orderBy(col("quartile")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want)
  }

  test("q73 quartiles: closed form matches ntile at every n mod 4 (n = 1..25)") {
    // pure arithmetic law check for the closed form used in the operator
    def ntileRef(n: Int): Seq[Int] = {
      val q = n / 4; val r = n % 4
      (1 to 4).flatMap(b => Seq.fill(if (b <= r) q + 1 else q)(b))
    }
    def closed(rnk: Long, n: Long): Int = {
      val q = n / 4; val r = n % 4
      (if (rnk <= (q + 1) * r) (rnk - 1) / (q + 1)
       else r + (rnk - 1 - (q + 1) * r) / math.max(q, 1L)).toInt + 1
    }
    for (n <- 1 to 25)
      assert((1 to n).map(i => closed(i.toLong, n.toLong)) === ntileRef(n), s"n=$n")
  }

  test("q73 quartiles: no partition-less window over the customer aggregate") {
    val plan = RelationalQueries.custQuartiles(spark, sf0001)
      .queryExecution.executedPlan.toString
    graft.util.CacheBag.release()
    // Ranks.distributed keys its windows by _pid (bounded per range
    // partition) or runs over the ≤ nPartitions offset rows; an ntile/
    // row_number over an EMPTY partition spec spanning the customer table
    // would reintroduce the single-task sort
    assert(!plan.contains("ntile"), s"ntile window survived:\n${plan.take(2000)}")
  }

  test("stratified sample is a map-side filter: no shuffle before aggregate") {
    val plan = RelationalQueries.stratifiedSample(spark, sf0001)
      .queryExecution.executedPlan.toString
    // one exchange for the final groupBy(lang) (+1 for orderBy) is fine; the
    // sampling itself must not add one — assert filter sits below any exchange
    assert(plan.contains("Filter"), plan.take(1500))
    val firstExchange = plan.indexOf("Exchange")
    val scanIdx = plan.lastIndexOf("Scan")
    assert(scanIdx > firstExchange, "sample filter should be scan-adjacent")
  }
}
