package graft.operators

import scala.collection.mutable

import graft.testutil.SparkTestBase

/** Semantic laws for the round-4 curation wave (q105–q119) — each query's
  * distributed plan is pinned against an independent driver-side brute
  * recompute on the sf0.001 corpus (the law the DuckDB oracle can't see:
  * the oracle mirrors the ALGORITHM, these mirror the DEFINITION). */
class CurationSpec extends SparkTestBase {

  private def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  private lazy val docRows: Array[(Long, String, String, Long)] = {
    import spark.implicits._
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
  }

  test("q105 span dedup == brute duplicated-window marking + island merge") {
    val w = CurationQueries.SpanGram
    val gramCount = mutable.Map.empty[String, Int]
    val perDoc = docRows.map { case (id, text, _, _) =>
      val toks = text.split(" ")
      (id, toks)
    }.filter(_._2.length >= w)
    for ((_, toks) <- perDoc; i <- 0 to toks.length - w)
      gramCount.updateWith(toks.slice(i, i + w).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val expect = perDoc.map { case (id, toks) =>
      val covered = Array.fill(toks.length)(false)
      for (i <- 0 to toks.length - w; if gramCount(toks.slice(i, i + w).mkString(" ")) >= 2;
           j <- i until i + w) covered(j) = true
      val dup = covered.count(identity).toLong
      val spans = covered.zipWithIndex.count { case (c, i) => c && (i == 0 || !covered(i - 1)) }.toLong
      (id, toks.length.toLong, dup, spans, toks.length - dup)
    }.toSeq
    val got = CurationQueries.spanDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
  }

  test("q105 merges token-ADJACENT duplicated windows into one span") {
    // doc0's duplicated 5-grams sit at positions 0 and 5 — intervals
    // [0,4] and [5,9] touch without overlapping and must merge (one
    // contiguous covered run); doc1's sit at 0 and 6 — a 1-token gap
    // keeps them separate. The sf fixtures never exercise this adjacency.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    Seq((0L, "a b c d e f g h i j"), (1L, "a b c d e z f g h i j"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CurationQueries.spanDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((0L, 10L, 10L, 1L, 0L), (1L, 11L, 10L, 2L, 1L)))
  }

  test("q106 PageRank == brute integer power iteration, and ranks are conserved") {
    val n = docRows.length.toLong
    val edges = docRows.flatMap { case (i, _, _, _) =>
      Seq(1L, 7L, 31L).zipWithIndex.collect {
        case (s, j) if i % 3 >= j => (i, (i + s) % n)
      }
    }
    val outdeg = edges.groupBy(_._1).map { case (s, es) => (s, es.length.toLong) }
    var r = docRows.map(d => (d._1, CurationQueries.PrInit)).toMap
    for (_ <- 1 to CurationQueries.PrIters) {
      val infl = mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) infl(d) += r(s) / outdeg(s)
      r = r.keys.map(v => (v, CurationQueries.PrInit * 15 / 100 + 85 * infl(v) / 100)).toMap
    }
    val expectTop = r.toSeq.sortBy { case (v, rk) => (-rk, v) }.take(20)
      .zipWithIndex.map { case ((v, rk), i) => (i + 1, v, rk) }
    // the law the r6 single-shuffle iteration rests on: the stride-1 edge
    // (i -> (i+1) mod N over dense doc_ids) is a bijection, so every node
    // has in-degree >= 1 and the per-iteration re-anchor onto the doc set
    // (left join + coalesce(infl, 0)) is an identity the operator may drop
    assert(edges.map(_._2).distinct.length === n.toInt,
      "in-degree law violated: some node has no in-link")
    val got = CurationQueries.pageRank(spark, sf0001).collect()
      .map(row => (row.getInt(0), row.getLong(1), row.getLong(2))).toSeq
    assert(got === expectTop)
    // floor losses only: total rank stays within [0.85, 1.0] of N * INIT
    val total = r.values.sum
    assert(total <= n * CurationQueries.PrInit)
    assert(total >= n * CurationQueries.PrInit * 85 / 100)
  }

  test("q107 canonicalization collapses every raw pair; canonicals are clean") {
    val rows = CurationQueries.urlCanonical(spark, sf0001).collect()
    assert(rows.map(_.getLong(1)).sum === 500L) // n_raw
    assert(rows.map(_.getLong(2)).sum === 250L) // n_canon: every (2k, 2k+1) pair collapses
    assert(rows.map(_.getLong(3)).sum === 250L) // n_dups
    for (r <- rows) {
      val canon = r.getString(4)
      assert(canon === canon.toLowerCase, s"uppercase survived: $canon")
      assert(!canon.contains(":443"), s"default port survived: $canon")
      assert(!canon.contains("utm_"), s"tracking param survived: $canon")
      assert(!canon.endsWith("/"), s"trailing slash survived: $canon")
    }
  }

  test("q108 frequency-rank quality == brute vocabulary ranking") {
    val vocab = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, text, _, _) <- docRows; t <- text.split(" ")) vocab(t) += 1
    val rank = vocab.toSeq.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => (t, i + 1L) }.toMap
    val perLang = docRows.map { case (_, text, lang, _) =>
      val toks = text.split(" ")
      val sumRnk = toks.map(rank).sum
      val tail = toks.count(rank(_) > 15).toLong
      (lang, sumRnk / toks.length, tail * 1000 / toks.length)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      (lang, xs.length.toLong, xs.map(_._2).sum / xs.length, xs.map(_._3).min, xs.map(_._3).max)
    }
    val got = CurationQueries.tokenRankQuality(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === perLang)
  }

  test("q109 rebalance == brute hash-thresholded copy counts") {
    val byLang = docRows.groupBy(_._3)
    val total = docRows.length.toLong
    val expect = byLang.toSeq.sortBy(_._1).map { case (lang, ds) =>
      val factor = total * 200 / ds.length
      val copies = ds.map { case (id, _, _, _) =>
        factor / 1000 + (if (md5Hash60(s"mix$id") % 1000 < factor % 1000) 1L else 0L)
      }
      (lang, ds.length.toLong, factor, copies.sum)
    }
    val got = CurationQueries.langRebalance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q110 phrase search == brute sliding-window occurrence counting") {
    val expect = CurationQueries.Phrases.map { case (qid, phrase) =>
      val terms = phrase.split(" ")
      val hits = docRows.flatMap { case (id, text, _, _) =>
        val toks = text.split(" ")
        val occ = (0 to toks.length - terms.length)
          .count(b => terms.indices.forall(i => toks(b + i) == terms(i)))
        if (occ > 0) Some((id, occ.toLong)) else None
      }
      (qid, phrase, hits.length.toLong, hits.map(_._2).sum,
        hits.map(_._1).min, hits.map(_._1).max)
    }
    val got = CurationQueries.phraseSearch(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }

  test("q114 bigram coverage == brute bigram-count recompute") {
    // mirror the engine's size(ws) >= 2 filter — Scala's sliding(2) would
    // otherwise emit a 1-element "bigram" for sub-2-token docs
    val eligible = docRows.filter(_._2.split(" ").length >= 2)
    val bgCount = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, text, _, _) <- eligible; bg <- text.split(" ").sliding(2).map(_.mkString(" ")))
      bgCount(bg) += 1
    val perLang = eligible.map { case (_, text, lang, _) =>
      val bgs = text.split(" ").sliding(2).map(_.mkString(" ")).toSeq
      val covered = bgs.count(bgCount(_) >= CurationQueries.LmMinCount).toLong
      val sumCnt = bgs.map(bgCount).sum
      (lang, covered * 1000 / bgs.length, sumCnt / bgs.length)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, xs) =>
      (lang, xs.length.toLong, xs.map(_._2).sum / xs.length,
        xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).sum / xs.length)
    }
    val got = CurationQueries.bigramCoverage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === perLang)
  }

  test("q115 webgraph audit == brute degree/reciprocity recompute") {
    val n = docRows.length.toLong
    val edges = docRows.flatMap { case (i, _, _, _) =>
      Seq(1L, 7L, 31L).zipWithIndex.collect {
        case (s, j) if i % 3 >= j => (i, (i + s) % n)
      }
    }.toSet
    val indeg = edges.groupBy(_._2).map { case (v, es) => (v, es.size.toLong) }.withDefaultValue(0L)
    val outdeg = edges.groupBy(_._1).map { case (v, es) => (v, es.size.toLong) }.withDefaultValue(0L)
    val recip = edges.filter { case (s, d) => edges.contains((d, s)) }
      .groupBy(_._1).map { case (v, es) => (v, es.size.toLong) }.withDefaultValue(0L)
    val expect = docRows.map(_._1)
      .map(v => (indeg(v), outdeg(v), v, recip(v)))
      .groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1)
      .map { case ((i, o), xs) =>
        (i, o, xs.length.toLong, xs.map(_._4).sum, xs.map(_._3).min, xs.map(_._3).max)
      }
    val got = CurationQueries.webgraphAudit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
  }

  test("q116 containment: values match brute shingle sets; containment >= jaccard") {
    val shd = docRows.flatMap { case (id, text, _, _) =>
      val toks = text.split(" ")
      if (toks.length < 3) None
      else Some(id -> toks.sliding(3).map(s => md5Hash60(s.mkString(" "))).toSet)
    }.toMap
    val rows = CurationQueries.containmentPairs(spark, sf0001).collect()
    assert(rows.nonEmpty, "containment fixture produced no pairs")
    for (r <- rows) {
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      val (a, b) = (shd(d1), shd(d2))
      val inter = (a & b).size.toLong
      assert(r.getLong(3) === inter * 1000 / a.size, s"cont_ab mismatch for ($d1,$d2)")
      assert(r.getLong(4) === inter * 1000 / b.size, s"cont_ba mismatch for ($d1,$d2)")
      assert(r.getLong(2) === inter * 1000 / (a.size + b.size - inter))
      assert(r.getLong(3) >= r.getLong(2) && r.getLong(4) >= r.getLong(2),
        "containment must dominate jaccard")
      assert(math.max(r.getLong(3), r.getLong(4)) >= CurationQueries.ContMinM)
    }
  }

  test("q118 syndication matrix partitions the q29 pair set; triangular and bounded") {
    val nPairs = TextQueries.lshNearDupPairs(spark, sf0001).count()
    val rows = CurationQueries.syndicationMatrix(spark, sf0001).collect()
    assert(rows.map(_.getLong(2)).sum === nPairs, "matrix must partition the pair set")
    for (r <- rows) {
      assert(r.getString(0) <= r.getString(1), "matrix not order-normalized")
      assert(r.getLong(3) >= 200L && r.getLong(4) <= 1000L)
      assert(r.getLong(3) <= r.getLong(4))
    }
  }

  test("q119 dedup timeline == brute first-occurrence recompute") {
    val firstOf = mutable.Map.empty[String, Long]
    for ((id, text, _, _) <- docRows) // docRows sorted by doc_id = crawl order
      firstOf.getOrElseUpdate(text, id)
    val expect = docRows.map { case (id, text, _, _) =>
      (id * 137 / 21600, if (firstOf(text) < id) 1L else 0L)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (bucket, xs) =>
      (bucket, xs.length.toLong, xs.map(_._2).sum, xs.map(_._2).sum * 1000 / xs.length)
    }
    val got = CurationQueries.dedupTimeline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
  }

  test("q120 leakage-safe split: no near-dup pair straddles splits; partition law") {
    import spark.implicits._
    val pairs = TextQueries.lshNearDupPairs(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect()
    // brute union-find
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    for ((a, b) <- pairs) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    def compOf(d: Long): Long = if (parent.contains(d)) find(d) else d
    def splitOf(d: Long): String = {
      val h = md5Hash60(s"split${compOf(d)}") % 1000
      if (h < 800) "train" else if (h < 900) "val" else "test"
    }
    for ((a, b) <- pairs)
      assert(splitOf(a) === splitOf(b), s"pair ($a,$b) straddles splits")
    val expect = docRows.map(_._1).groupBy(splitOf).toSeq.sortBy(_._1)
      .map { case (s, ds) =>
        (s, ds.length.toLong, ds.map(compOf).distinct.length.toLong, ds.min, ds.max)
      }
    val got = GraphQueries.leakageSafeSplit(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
    assert(got.map(_._2).sum === docRows.length.toLong)
  }

  test("q121 hard negatives == brute label-filtered exact L2 top-k") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.map(x => math.floor(x.toDouble * 1000).toLong), l) }
    val queries = vecs.filter(_._1 < 10)
    val expect = queries.sortBy(_._1).flatMap { case (qid, qv, ql) =>
      vecs.filter(_._3 != ql)
        .map { case (id, v, _) =>
          (id, qv.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum)
        }
        .sortBy { case (id, d) => (d, id) }.take(5)
        .zipWithIndex.map { case ((id, d), i) => (qid, i + 1, id, d) }
    }.toSeq
    val got = SimilarityQueries.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // every negative's label differs from its query's
    val labelOf = vecs.map(v => (v._1, v._3)).toMap
    for ((qid, _, nid, _) <- got) assert(labelOf(nid) != labelOf(qid))
  }

  test("q124 bitext mining == brute cross-lingual cosine + margin recompute") {
    import spark.implicits._
    val langOf = docRows.map(d => (d._1, d._3)).toMap
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => (id, v.map(x => math.floor(x.toDouble * 1000).toLong)) }
      .filter { case (_, qv) => qv.map(x => x * x).sum > 0 }
    def cosM(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val nq = a.map(x => x * x).sum
      val nn = b.map(x => x * x).sum
      math.floor((dot * math.abs(dot)).toDouble / (nq * nn).toDouble * 1000000).toLong
    }
    val en = vecs.filter(v => langOf(v._1) == "en")
    val expect = vecs.filter(v => langOf(v._1) != "en" && v._1 < 50).sortBy(_._1)
      .map { case (qid, qv) =>
        val ranked = en.map { case (id, v) => (id, cosM(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(3)
        (qid, langOf(qid), ranked(0)._1, ranked(0)._2,
          2 * ranked(0)._2 - ranked(1)._2 - ranked(2)._2)
      }.toSeq
    val got = SimilarityQueries.bitextMining(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === expect)
    // s1 >= s2 >= s3 makes the margin non-negative by construction
    assert(got.forall(_._5 >= 0))
  }

  test("q126 robots filter == brute longest-prefix-wins recompute") {
    import spark.implicits._
    val srcRows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect()
    val expect = srcRows.map { case (id, src) =>
      // the narrow disallow rule for srcN is '/doc/<N%10>' — blocked iff
      // the doc id's first digit matches (longest prefix wins)
      val n = src.stripPrefix("src").toInt
      (src, id.toString.startsWith((n % 10).toString))
    }.groupBy(_._1).toSeq.sortBy { case (src, _) => src }.map { case (src, xs) =>
      val b = xs.count(_._2).toLong
      (src, xs.length.toLong, b, b * 1000 / xs.length)
    }
    val got = CurationQueries.robotsFilter(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    assert(got.map(_._3).sum > 0, "fixture must block some pages")
    // full coverage: the derived rule table must not drop any source —
    // every corpus page appears in exactly one report row (ADVICE r4)
    assert(got.map(_._2).sum === srcRows.length.toLong,
      "robots report lost pages — rule table does not cover every source")
  }

  test("q137 filter cascade == brute rule replay; identities hold") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val flags = docs.map { case (_, text) =>
      val ws = text.split(" ", -1)
      val grams = if (ws.length >= 2) ws.sliding(2).map(_.mkString(" ")).toArray
        else Array.empty[String]
      val fShort = ws.length < CurationQueries.CascShortTok
      val fRep = grams.nonEmpty &&
        (grams.length - grams.distinct.length).toLong * 1000 / grams.length > CurationQueries.CascDup2Pm
      val fDiv = ws.distinct.length.toLong * 1000 / ws.length < CurationQueries.CascDiversPm
      (fShort, fRep, fDiv)
    }
    def cnt(f: ((Boolean, Boolean, Boolean)) => Boolean) = flags.count(f).toLong
    val got = CurationQueries.filterCascade(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("short") === ((cnt(_._1), cnt(f => f._1 && !f._2 && !f._3))))
    assert(got("repetitive") === ((cnt(_._2), cnt(f => f._2 && !f._1 && !f._3))))
    assert(got("low_diversity") === ((cnt(_._3), cnt(f => f._3 && !f._1 && !f._2))))
    assert(got("TOTAL") === ((cnt(f => f._1 || f._2 || f._3), cnt(f => !f._1 && !f._2 && !f._3))))
    // conservation + every rule carries marginal value on the fixture
    assert(got("TOTAL")._1 + got("TOTAL")._2 === docs.length.toLong)
    Seq("short", "repetitive", "low_diversity").foreach { r =>
      assert(got(r)._2 > 0, s"rule $r has zero sole rejections — vacuous on the fixture")
    }
  }

  test("q113 BPE trainer reproduces the hand-computed merge sequence") {
    // vocab: "abab"x2, "abc"x1 → pairs a·b: 2·2 + 1 = 5, b·a: 2, b·c: 1 →
    // merge (a,b,5); then ab·ab:2, ab·c:1 → merge (ab,ab,2); then (ab,c,1)
    val merges = CurationQueries.trainBpe(Seq(("abab", 2L), ("abc", 1L)), 3)
    assert(merges === Seq(("a", "b", 5L), ("ab", "ab", 2L), ("ab", "c", 1L)))
    // exhaustion: asking for more merges than exist stops cleanly
    assert(CurationQueries.trainBpe(Seq(("ab", 1L)), 5) === Seq(("a", "b", 1L)))
  }

  test("q123 BPE encode: segmentation laws + corpus fertility recompute") {
    // segmentation replays the trainer's merges ((a,b), (ab,ab), (ab,c)):
    // both fixture words merge completely; a 2-merge table leaves "abc"
    // as [ab, c]
    val merges = CurationQueries.trainBpe(Seq(("abab", 2L), ("abc", 1L)), 3)
      .map(m => (m._1, m._2))
    assert(CurationQueries.bpeSegment("abab", merges) === Vector("abab"))
    assert(CurationQueries.bpeSegment("abc", merges) === Vector("abc"))
    assert(CurationQueries.bpeSegment("abc", merges.take(2)) === Vector("ab", "c"))
    assert(CurationQueries.bpeSegment("zq", merges) === Vector("z", "q")) // untrained chars
    // concatenating the segments always reproduces the word
    for (w <- Seq("abab", "abc", "aabbc", ""))
      assert(CurationQueries.bpeSegment(w, merges).mkString === w)
    // corpus run == exact brute recompute: the distributed chained-replace
    // encode must agree with the driver-side bpeSegment on EVERY token
    val vocab = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((_, text, _, _) <- docRows; w <- text.split(" ")) vocab(w) += 1
    val corpusMerges = CurationQueries
      .trainBpe(vocab.toSeq.sortBy { case (w, c) => (-c, w) }, CurationQueries.BpeMerges)
      .map(m => (m._1, m._2))
    val segLen = vocab.keys.map(w =>
      (w, CurationQueries.bpeSegment(w, corpusMerges).length.toLong)).toMap
    val expect = docRows.flatMap { case (_, text, lang, _) =>
      text.split(" ").map(w => (lang, w))
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (lang, ws) =>
      val nSub = ws.map(t => segLen(t._2)).sum
      val nChars = ws.map(_._2.length.toLong).sum
      (lang, ws.length.toLong, nSub, nSub * 1000 / ws.length, nChars * 1000 / nSub)
    }
    val rows = CurationQueries.bpeEncode(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(rows === expect)
  }

  test("q123 distributed expression encode == bpeSegment on boundary-adversarial words") {
    // same-char runs ("aaa") are the case a chained string replace gets
    // WRONG (a match consumes its trailing boundary and skips pairs);
    // "ba b" exercises symbol-boundary anchoring
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    val texts = Seq("ba b ab ab ab", "aaa aab ab ba", "abab abab b a")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "en", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val vocab = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for (t <- texts; w <- t.split(" ")) vocab(w) += 1
    val merges = CurationQueries
      .trainBpe(vocab.toSeq.sortBy { case (w, c) => (-c, w) }, CurationQueries.BpeMerges)
      .map(m => (m._1, m._2))
    val segLen = vocab.keys.map(w =>
      (w, CurationQueries.bpeSegment(w, merges).length.toLong)).toMap
    val all = texts.flatMap(_.split(" "))
    val wantSub = all.map(segLen).sum
    val got = CurationQueries.bpeEncode(spark, dir).collect()
    assert(got.map(_.getLong(2)).sum === wantSub, "distributed encode diverged from bpeSegment")
    assert(got.map(_.getLong(1)).sum === all.length.toLong)
  }

  test("q113 BPE on the corpus: distinct ranks, positive counts, deterministic") {
    val rows = CurationQueries.bpeMerges(spark, sf0001).collect()
    assert(rows.length === CurationQueries.BpeMerges)
    assert(rows.map(_.getLong(0)).toSeq === (1L to CurationQueries.BpeMerges))
    assert(rows.forall(_.getLong(3) > 0))
    val again = CurationQueries.bpeMerges(spark, sf0001).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
