package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Invariant guards for the text-analysis report operators over the real
  * sf0.001 testdata — the checks the hash-match oracle can't make
  * (it mirrors the same formulas, so a degenerate signal still matches). */
class TextAnalysisSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  test("repetition signal is bounded, consistent, and not degenerate") {
    assume(hasTestData)
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.length.toLong === Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 3).count())
    rows.foreach { r =>
      val (t2, u2, t3, u3) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(t2 === t3 + 1, s"bigram/trigram counts inconsistent: $r")
      assert(u2 >= 1 && u2 <= t2 && u3 >= 1 && u3 <= t3, s"distinct counts out of range: $r")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0)
    }
    // the synthetic small-vocab corpus must show SOME internal repetition,
    // or the signal is vacuous at test scale
    assert(rows.exists(_.getDouble(5) > 0.0), "no document shows bigram repetition")
  }

  test("length quantiles are ordered, within observed range, and complete") {
    assume(hasTestData)
    val rows = TextAnalysis.lengthQuantiles(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length.toLong === nSources)
    val (lo, hi) = {
      val mm = Tables.documents(spark, sf)
        .agg(min(col("n_chars")), max(col("n_chars"))).head()
      (mm.getLong(0), mm.getLong(1))
    }
    rows.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3) && !r.isNullAt(4),
        s"a quantile rank missed every row (ceil formula off-by-one): $r")
      val (p50, p90, p99) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(p50 <= p90 && p90 <= p99, s"quantiles not monotone: $r")
      assert(p50 >= lo && p99 <= hi, s"quantile outside observed range: $r")
    }
  }

  test("approx quantile sketch tracks the exact per-source quantiles") {
    assume(hasTestData)
    val exact = TextAnalysis.lengthQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val rows = TextAnalysis.lengthQuantilesApprox(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet === exact.keySet)
    rows.foreach { r =>
      val src = r.getString(0)
      // the query's own exact quantiles must equal the exact twin's
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) === exact(src),
        s"$src: approx-twin exact quantiles diverge from the exact twin")
      // and every sketch value honored its ε·n rank-error bound
      Seq(("p50_ok", r.getLong(5)), ("p90_ok", r.getLong(6)), ("p99_ok", r.getLong(7)))
        .foreach { case (name, v) =>
          assert(v === 1L, s"$src: $name is 0 — sketch violated its rank-error bound")
        }
    }
  }

  test("distributed BPE trainer reproduces the sequential reference merge sequence") {
    assume(hasTestData)
    val got = TextAnalysis.bpeTrain(spark, sf, nMerges = 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))

    // independent sequential reference over the same (type, tf) relation
    var types: Map[Seq[String], Long] = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).count().collect()
      .map(r => TextAnalysis.codePointSymbols(r.getString(0)) -> r.getLong(1)).toMap
    val want = (1 to 8).flatMap { rk =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      types.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) None
      else {
        // tie-break on UTF-8 BYTES, matching Spark SQL's binary string
        // ordering — Scala's default String ordering compares UTF-16
        // code units, which disagrees for supplementary-plane chars
        val utf8: Ordering[String] = (x: String, y: String) =>
          java.util.Arrays.compareUnsigned(
            x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8, utf8))
        types = types.toSeq.map { case (syms, f) =>
          (TextAnalysis.applyMerge(syms, l, r), f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        Some((rk.toLong, l, r, n))
      }
    }
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty, "BPE trainer produced no merges — vacuous corpus")
  }

  test("BPE encode matches a sequential train-then-apply reference per document") {
    assume(hasTestData)
    val nMerges = 8
    val got = TextAnalysis.bpeEncode(spark, sf, nMerges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap

    // sequential reference: train merges over the type relation (same
    // UTF-8 argmax tie-break as the trainer spec), then apply them to
    // every word type and aggregate per document
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var types: Map[String, (Seq[String], Long)] = docs
      .flatMap(_._2.split(" ", -1)).groupBy(identity)
      .map { case (t, occ) => t -> (TextAnalysis.codePointSymbols(t) -> occ.length.toLong) }
    val utf8: Ordering[String] = (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      types.values.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.minBy { case ((a, b), c) => (-c, a, b) }(
          Ordering.Tuple3(Ordering.Long, utf8, utf8))
        types = types.map { case (t, (syms, f)) =>
          t -> (TextAnalysis.applyMerge(syms, l, r) -> f)
        }
        round += 1
      }
    }
    val want = docs.map { case (id, text) =>
      val toks = text.split(" ", -1).toSeq.filter(_.nonEmpty)
      val nSyms = toks.map(t => types(t)._1.length.toLong).sum
      // code POINTS, matching both engines' length(); String.length
      // would count UTF-16 units and diverge on supplementary planes
      val nChars = toks.map(t => t.codePointCount(0, t.length).toLong).sum
      id -> ((toks.length.toLong, nSyms, nChars,
        math.floor(nChars.toDouble / nSyms * 1e6) / 1e6))
    }.filter(_._2._1 > 0).toMap
    assert(got === want)
    assert(got.values.exists { case (_, ns, nc, _) => ns < nc },
      "no merge ever fired — encode check is vacuous")
  }

  test("BM25 retrieval matches a sequential reference ranking; the postings-table twin is row-identical") {
    assume(hasTestData)
    val got = TextAnalysis.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "BM25 returned nothing — vacuous corpus")
    assert(got.map(_._1).distinct.length >= 2, "fewer than 2 queries ranked")
    assert(got.exists(_._4 > 0L), "no ranked doc scored > 0")

    // independent sequential reference: same integer micro-unit math
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    val tf: Map[Long, Map[String, Long]] =
      docs.map { case (id, ts) => id -> ts.groupMapReduce(identity)(_ => 1L)(_ + _) }
    val dl = tf.map { case (id, m) => id -> m.values.sum }
    val n = dl.size.toLong
    val tl = dl.values.sum
    val df: Map[String, Long] =
      tf.values.flatMap(_.keys).groupMapReduce(identity)(_ => 1L)(_ + _)
    def idfU(t: String): Long =
      math.floor(math.log((n.toDouble - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * 1000000).toLong
    val want = (0L until 8L).filter(tf.contains).flatMap { qid =>
      val qTerms = tf(qid).keys.toSeq
      // candidates = docs sharing >= 1 query term (the join's row set);
      // a shared-term doc whose contributions all floor to 0 still ranks
      val scores = tf.keys.filter(_ != qid).flatMap { d =>
        val contribs = qTerms.flatMap { t =>
          tf(d).get(t).map { f =>
            math.floor(idfU(t) * (f * 2.2) /
              (f + 1.2 * (0.25 + 0.75 * dl(d) * n / tl.toDouble))).toLong
          }
        }
        if (contribs.nonEmpty) Some(d -> contribs.sum) else None
      }.toSeq
      scores.sortBy { case (d, s) => (-s, d) }.take(5).zipWithIndex.map {
        case ((d, s), i) => (qid, d, (i + 1).toLong, s)
      }
    }
    assert(got.toSeq == want,
      s"BM25 diverged from the sequential reference (first got: ${got.take(3).toSeq}, want: ${want.take(3)})")

    // the persisted-postings twin serves identical rows
    val twin = TextAnalysis.bm25TopKIndexed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(twin.toSeq == got.toSeq, "postings-table BM25 diverged from the in-plan form")
  }

  test("sampled BPE training: sample=1.0 is byte-identical to full training; a 0.5 sample still encodes the WHOLE corpus") {
    assume(hasTestData)
    // sample=1.0 short-circuits to the unsampled plan — train rows and
    // the full-encode path must be identical
    val fullTrain = TextAnalysis.bpeTrain(spark, sf, nMerges = 6).collect().map(_.toSeq).toSeq
    assert(TextAnalysis.bpeTrain(spark, sf, nMerges = 6, sampleFraction = 1.0)
      .collect().map(_.toSeq).toSeq == fullTrain)
    val fullEnc = TextAnalysis.bpeEncode(spark, sf, nMerges = 6).collect().map(_.toSeq).toSeq
    assert(TextAnalysis.bpeEncodeSampled(spark, sf, nMerges = 6, sampleFraction = 1.0)
      .collect().map(_.toSeq).toSeq == fullEnc)
    // half-sample training: the merge loop prices only doc_id%100<50,
    // but the learned vocabulary still covers EVERY full-corpus type —
    // the encode join loses no documents and no tokens vs full training
    val sampled = TextAnalysis.bpeEncodeSampled(spark, sf, nMerges = 6, sampleFraction = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    val full = fullEnc.map(r => r(0).asInstanceOf[Long] ->
      (r(1).asInstanceOf[Long], r(3).asInstanceOf[Long])).toMap
    assert(sampled.keySet == full.keySet,
      "sampled-trained encode lost documents vs full training")
    // token and char denominators are training-independent — only the
    // symbol counts may differ under a different merge list
    assert(sampled == full,
      "per-doc token/char totals changed under sampled training")
    // and the sampled merge list itself differs from full training here
    // (the sample is a real subset), so the parity above is not the
    // trivial consequence of identical training
    val sampledTrain = TextAnalysis.bpeTrain(spark, sf, nMerges = 6, sampleFraction = 0.5)
      .collect().map(_.toSeq).toSeq
    assert(sampledTrain.nonEmpty, "sampled trainer produced no merges — vacuous sample")
  }

  test("bpeFertility reconciles with the per-doc encode rollup and is non-degenerate") {
    assume(hasTestData)
    val rows = TextAnalysis.bpeFertility(spark, sf).collect()
    assert(rows.length > 1, "fertility must split by source — one row is a degenerate report")
    // totals reconcile with the per-doc encode relation it aggregates
    val enc = TextAnalysis.bpeEncode(spark, sf).agg(
      sum(col("n_tokens")), sum(col("n_symbols")), sum(col("n_chars"))).head()
    assert(rows.map(_.getLong(2)).sum == enc.getLong(0), "n_words total mismatch")
    assert(rows.map(_.getLong(3)).sum == enc.getLong(1), "n_bpe_tokens total mismatch")
    assert(rows.map(_.getLong(4)).sum == enc.getLong(2), "n_chars total mismatch")
    assert(rows.map(_.getLong(1)).sum == Tables.documents(spark, sf).count(),
      "every document keeps its slot (left-join contract)")
    rows.foreach { r =>
      val (fert, cpt) = (r.getDouble(5), r.getDouble(6))
      // a 10-merge vocabulary still splits most words into several
      // symbols: fertility must sit strictly above 1 token/word, and
      // compression strictly above 0 chars/token
      assert(fert > 1.0 && fert < 20.0, s"implausible fertility: $r")
      assert(cpt > 0.0 && cpt < 10.0, s"implausible chars/token: $r")
    }
  }

  test("bigram LM score: probability mass normalizes and icp is well-formed") {
    assume(hasTestData)
    val rows = TextAnalysis.lmBigram(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sumIcp, maxIcp) = (r.getLong(1), r.getLong(2), r.getLong(3))
      // icp = c(w1·) DIV c(w1w2) ≥ 1 always (the pair is one of the contexts)
      assert(sumIcp >= n, s"icp below 1 somewhere in doc ${r.getLong(0)}")
      assert(maxIcp <= sumIcp && maxIcp >= 1)
    }
    // discriminative at test scale: not every transition is equally likely
    assert(rows.map(_.getLong(3)).max > 1, "every bigram deterministic — vacuous corpus")
    // per-doc bigram counts reconcile with the raw token stream
    val expected = Tables.documents(spark, sf)
      .select(greatest(size(split(col("text"), " ")) - 1, lit(0)).cast("long").as("k"))
      .agg(sum(col("k"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum === expected)
  }

  test("ngram novelty: occurrence totals reconcile with the raw token stream") {
    assume(hasTestData)
    val rows = TextAnalysis.ngramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    // Σ per-source occurrences = Σ_docs max(0, n_tokens − 7), counted
    // directly off the corpus — the explosion must drop nothing
    val expected = Tables.documents(spark, sf)
      .select(greatest(size(split(col("text"), " ")) - 7, lit(0)).cast("long").as("k"))
      .agg(sum(col("k"))).collect().head.getLong(0)
    assert(rows.map(_.getLong(1)).sum === expected)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(1), s"dup occurrences exceed total: $r")
      assert(r.getLong(2) <= r.getLong(1), s"distinct grams exceed occurrences: $r")
      val rate = r.getDouble(4)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    assert(rows.map(_.getLong(3)).sum > 0, "no duplicate 8-gram at test scale — vacuous")
  }

  test("topTerms plans the bounded top-k aggregate, not a per-doc window sort") {
    assume(hasTestData)
    val plan = TextAnalysis.topTerms(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "topTerms regressed to the window idiom")
    assert(plan.contains("partial_graft_topk"),
      "graft_topk is not partially aggregated map-side")
  }

  test("batched BPE merges: ~m× fewer driver rounds, identical vocabulary on a disjoint-pair corpus") {
    // five word types whose top pairs share no symbols — the regime
    // where batched selection is EXACT (disjoint merges commute and
    // their counts are invariant under each other); distinct
    // frequencies pin the acceptance order
    val dir = tempDir("bpebatch")
    spark.createDataFrame(Seq(
      (0L, ("ab " * 50).trim), (1L, ("cd " * 40).trim),
      (2L, ("ef " * 30).trim), (3L, ("gh " * 20).trim),
      (4L, ("ij " * 10).trim)
    )).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")

    val (seqMerges, seqTypes, seqRounds) =
      TextAnalysis.trainStateWithRounds(spark, dir, 5, 1.0, batchMerges = 1)
    val (batMerges, batTypes, batRounds) =
      TextAnalysis.trainStateWithRounds(spark, dir, 5, 1.0, batchMerges = 5)
    assert(seqRounds == 5, s"sequential trainer ran $seqRounds rounds, expected 5")
    assert(batRounds == 1, s"batched trainer ran $batRounds rounds, expected 1 (5× fewer)")
    assert(seqMerges == batMerges,
      s"batched merge list diverged:\n seq=$seqMerges\n bat=$batMerges")
    assert(seqTypes.collect().sortBy(_._1).toSeq == batTypes.collect().sortBy(_._1).toSeq,
      "batched final type state diverged from sequential")

    // overlap safety: when candidates SHARE symbols the batch accepts
    // only the disjoint prefix and defers the rest — never applies two
    // merges whose interleaving could disagree with sequential ranks
    val dir2 = tempDir("bpebatch2")
    // "aba": pairs (a,b) and (b,a) overlap on both symbols
    spark.createDataFrame(Seq((0L, ("aba " * 50).trim))).toDF("doc_id", "text")
      .write.parquet(s"$dir2/documents.parquet")
    val (m1, _, _) = TextAnalysis.trainStateWithRounds(spark, dir2, 2, 1.0, batchMerges = 1)
    val (m2, _, r2) = TextAnalysis.trainStateWithRounds(spark, dir2, 2, 1.0, batchMerges = 2)
    assert(m1 == m2, s"overlapping candidates broke batched parity:\n seq=$m1\n bat=$m2")
    assert(r2 == 2, "overlapping pairs must NOT land in one batch")
  }
}
