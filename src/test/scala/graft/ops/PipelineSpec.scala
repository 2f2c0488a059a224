package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Determinism guards for the curation pipeline: sampling decisions must
  * be pure functions of the row — identical across partitionings and
  * reruns — or a resumed/retried 100 TB job silently samples a
  * different corpus. */
class PipelineSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  test("stratified sample picks the same docs regardless of partitioning") {
    assume(hasTestData)
    val base = Pipeline.stratifiedSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(base.nonEmpty, "sample must not be vacuous at test scale")
    // same query over a repartitioned scan — decisions must not move
    val shuffled = Pipeline.stratifiedSample(spark, sf)
      .repartition(7).collect().map(_.getLong(0)).toSet
    assert(shuffled === base)
    // and a rerun is bit-identical
    assert(Pipeline.stratifiedSample(spark, sf).collect().map(_.getLong(0)).toSet === base)
  }

  test("funnel counts are monotone per source and consistent with the training set") {
    assume(hasTestData)
    val rows = Pipeline.funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(n, lang, qual, dedup, samp) = (1 to 5).map(r.getLong)
      assert(n >= lang && lang >= qual && qual >= dedup && dedup >= samp,
        s"funnel not monotone for ${r.getString(0)}: $r")
    }
    val totalSampled = rows.map(_.getLong(5)).sum
    assert(totalSampled === Pipeline.trainingSet(spark, sf).count(),
      "funnel's final stage must equal the training-set manifest size")
  }

  test("balanced mixture equalizes source contributions (within integer-rate rounding)") {
    assume(hasTestData)
    val perSource = Pipeline.balancedMixture(spark, sf)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(perSource.nonEmpty)
    // each source contributes ~min_count docs; hash-bucket granularity
    // means some spread, but no source may dominate by more than 3x
    assert(perSource.max <= 3 * math.max(1L, perSource.min),
      s"mixture skew too high: ${perSource.toSeq.sorted}")
  }

  test("training set output respects every gate") {
    assume(hasTestData)
    val ts = Pipeline.trainingSet(spark, sf).collect()
    assert(ts.nonEmpty, "pipeline must not be vacuous at test scale")
    ts.foreach { r =>
      assert(r.getDouble(3) >= 0.6, s"quality gate leaked: $r")
    }
    // sampled subset of the gated set: every kept doc is a dedup keeper
    val texts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val minByText = texts.groupBy(_._2).map { case (_, m) => m.keys.min }.toSet
    ts.foreach(r => assert(minByText.contains(r.getLong(0)),
      s"non-keeper doc ${r.getLong(0)} survived dedup gate"))
  }

  test("temperature mixture flattens toward the tail without inverting order") {
    assume(hasTestData)
    val rows = Pipeline.temperatureMixture(spark, sf)
      .select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.values.forall(r => r >= 1 && r <= 100))
    assert(rows.values.max === 100L, "the lightest source must be kept in full")
    // heavier source → lower-or-equal rate (α<1 flattens, never inverts)
    val mass = Tables.documents(spark, sf)
      .groupBy("source").agg(sum(size(split(col("text"), " ")).cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.keys.toSeq.combinations(2).foreach { case Seq(a, b) =>
      val (light, heavy) = if (mass(a) <= mass(b)) (a, b) else (b, a)
      assert(rows(light) >= rows(heavy), s"rate order inverted for $light/$heavy")
    }
  }

  test("token shards conserve tokens, stay contiguous per source, and are deterministic") {
    assume(hasTestData)
    val rows = Pipeline.tokenShards(spark, sf).collect()
    assert(rows.nonEmpty, "shard manifest must not be vacuous at test scale")
    // conservation: shard token sums add up to the corpus token count
    val totalTokens = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long")).collect().map(_.getLong(0)).sum
    assert(rows.map(_.getLong(3)).sum === totalTokens, "tokens lost or duplicated across shards")
    // shard ids are contiguous 0..max within each source, doc ranges don't interleave
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byId = rs.sortBy(_.getLong(1))
      assert(byId.map(_.getLong(1)).toSeq === (0L until byId.length).toSeq,
        s"$src shard ids not contiguous: ${byId.map(_.getLong(1)).toSeq}")
      byId.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4),
          s"$src shards ${a.getLong(1)}/${b.getLong(1)} doc ranges interleave")
        case _ =>
      }
    }
    // packing decisions are pure functions of the data, not the partitioning
    val again = Pipeline.tokenShards(spark, sf).collect()
    assert(again.map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("bloom decontamination never misses an exactly-contaminated doc (no false negatives)") {
    assume(hasTestData)
    val exact = Pipeline.decontaminate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bloom = Pipeline.bloomDecontaminate(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(bloom.keySet === exact.keySet)
    exact.foreach { case (src, (nDocs, nContaminated)) =>
      val (bDocs, bContaminated, bMissed) = bloom(src)
      assert(bDocs === nDocs, s"$src doc universe must match the exact twin")
      assert(bContaminated === nContaminated,
        s"$src: bloom twin's exact-contamination column diverges from the exact twin")
      assert(bMissed === 0L,
        s"$src: bloom missed $bMissed exactly-contaminated docs — a false negative, " +
        "which the sketch contract forbids")
    }
    // non-vacuous: the exact pass finds contamination at test scale
    assert(exact.values.map(_._2).sum > 0, "exact decontamination found nothing — vacuous test")
  }

  test("leakage-safe split: near-dup pairs never straddle splits; totals reconcile") {
    assume(hasTestData)
    val rows = Pipeline.leakageSafeSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum === Tables.documents(spark, sf).count())
    assert(rows.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
    // the leakage invariant, checked against the op's own assignment
    // rule replayed per doc: every detected near-dup pair lands in ONE
    // split (the guarantee a doc_id-hashed split would break)
    val comp = graft.ops.Dedup.dupComponents(spark, sf)
    val perDoc = Tables.documents(spark, sf).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("comp_id"), col("doc_id")))
      .withColumn("bucket",
        expr("CAST(conv(substr(md5(CAST(cluster_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % 100"))
      .withColumn("split",
        when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
    val straddling = graft.ops.Dedup.ngramJaccard(spark, sf)
      .join(perDoc.as("pa"), col("doc_a") === col("pa.doc_id"))
      .join(perDoc.as("pb"), col("doc_b") === col("pb.doc_id"))
      .filter(col("pa.split") =!= col("pb.split"))
      .count()
    assert(straddling === 0L, "a near-dup pair crossed a split boundary")
    // non-vacuous: some docs really are cluster-bound at test scale
    assert(rows.map(_.getLong(3)).sum > 0, "no clustered docs — vacuous")
  }

  test("packing plan: accounting identities hold and chop splits are non-vacuous") {
    assume(hasTestData)
    val rows = Pipeline.packingPlan(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, seqs, _, truncated, waste) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      // chop uses the minimum number of budget-sized sequences
      assert(seqs === (total + 511) / 512, s"chop_seqs wrong for ${r.getString(0)}")
      // pad policy: every doc's slot splits exactly into kept + waste
      assert((total - truncated) + waste === nDocs * 512,
        s"pad accounting broken for ${r.getString(0)}")
    }
    assert(rows.map(_.getLong(4)).sum > 0,
      "no document ever straddles a chop boundary — vacuous at test scale")
  }

  test("gopher quality gate: rules are individually non-vacuous and counts are consistent") {
    assume(hasTestData)
    val rows = Pipeline.gopherQuality(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pass) = (r.getLong(1), r.getLong(2))
      val fails = (3 to 6).map(r.getLong(_))
      assert(pass <= n && fails.forall(_ <= n), s"counts exceed n_docs: $r")
      // a doc failing any rule is not in n_pass; failures can overlap,
      // so pass >= n - sum(fails) and pass <= n - max(fails)
      assert(pass >= n - fails.sum && pass <= n - fails.max, s"pass/fail inconsistent: $r")
    }
    // every rule must both fail AND pass somewhere in the corpus —
    // a rule that never fires (or always fires) is a dead threshold
    (3 to 6).foreach { i =>
      assert(rows.map(_.getLong(i)).sum > 0, s"rule at column $i never fails — vacuous")
    }
    assert(rows.map(_.getLong(2)).sum > 0, "no document passes the gate — thresholds broken")
  }

  test("DSIR weights discriminate: every source has both target-like and raw-like docs") {
    assume(hasTestData)
    val rows = Pipeline.dsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nPos) = (r.getLong(1), r.getLong(3))
      assert(nPos > 0 && nPos < n,
        s"${r.getString(0)}: importance weights do not discriminate (n_target_like=$nPos of $n)")
      // the argmax doc's weight bounds the mean from above
      assert(r.getDouble(5) >= r.getDouble(2), s"top_weight below mean_weight: $r")
    }
  }

  test("curation manifest partitions the corpus with one reason per doc") {
    assume(hasTestData)
    val rows = Pipeline.curationManifest(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    // decisions are mutually exclusive and exhaustive — the counts must
    // sum to the corpus, not over- or under-count a doc with 2 reasons
    assert(rows.map(_.getLong(2)).sum === total, "manifest does not partition the corpus")
    val decisions = rows.map(_.getString(1)).toSet
    assert(decisions.contains("keep"), "nothing survives curation — broken precedence")
    // near_dup and quality must fire on the real corpus; exact_dup
    // can't (this corpus has zero identical texts below sf0.1) and is
    // pinned by the constructed-corpus test below instead
    Seq("near_dup", "quality").foreach { d =>
      assert(decisions.contains(d), s"decision '$d' never fires — vacuous at test scale")
    }
  }

  test("curation manifest precedence: exact_dup shadows near_dup shadows quality (constructed corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_manifest").toFile
    try {
      val s = spark
      import s.implicits._
      // Per-doc UNIQUE vocabularies (prefix letter), so shared shingles
      // exist only within an intended near-dup pair and the DF cap
      // (df > max(2, 20% of 6 docs) = 2) cannot eat the pair evidence.
      // Each passing doc: one "the" + 39 distinct 5-char words → nw=40,
      // sum_len=198 ∈ [160, 200], stop 1·50 ≥ 40, max_tok=1 — passes
      // all four gopher rules; noStop drops the "the" → fails ok_stop.
      def vocab(p: String) = (1 to 39).map(i => f"$p$i%04d")
      val a = ("the" +: vocab("a")).mkString(" ")
      val b = ("the" +: vocab("b")).mkString(" ")
      val bNear = b.replace("b0020", "x0020") // one word → near-dup of b
      val noStop = (vocab("c") :+ "c0040").mkString(" ")
      val d = ("the" +: vocab("d")).mkString(" ")
      // doc2 = exact copy of doc1 (also a near-dup cluster {1,2} —
      // precedence must still say exact_dup); doc4 near-dups doc3;
      // doc5 fails quality only; docs 1/3/6 are keepers that pass.
      Seq(
        (1L, a, "en", "srcM", a.length.toLong),
        (2L, a, "en", "srcM", a.length.toLong),
        (3L, b, "en", "srcM", b.length.toLong),
        (4L, bNear, "en", "srcM", bNear.length.toLong),
        (5L, noStop, "en", "srcM", noStop.length.toLong),
        (6L, d, "en", "srcM", d.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Pipeline.curationManifest(spark, tmp.toString).collect()
        .map(r => r.getString(1) -> r.getLong(2)).toMap
      assert(got.get("exact_dup").contains(1L), s"exact_dup (doc 2): $got")
      assert(got.get("near_dup").contains(1L), s"near_dup (doc 4): $got")
      assert(got.get("quality").contains(1L), s"quality (doc 5): $got")
      assert(got.get("keep").contains(3L), s"keep (docs 1/3/6): $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("fuzzy decontamination flags near-dup eval docs, not stray phrase overlap (constructed corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fuzzydecon").toFile
    try {
      val s = spark
      import s.implicits._
      def vocab(p: String, n: Int) = (1 to n).map(i => f"$p$i%04d")
      // bench doc 1: 40 unique tokens. Corpus doc 20: the same text with
      // ONE token changed (a lightly-edited copy — high shingle Jaccard).
      // Corpus doc 21: shares exactly one 3-token phrase with the bench
      // doc, embedded in otherwise-unique text (stray quotation — low
      // Jaccard). The quoted phrase spans the token the edited copy
      // changed, so its shingle lives in bench+quoting only (df = 2)
      // and survives the DF cap. Corpus doc 22: unrelated.
      val benchTokens = vocab("e", 40)
      val bench = benchTokens.mkString(" ")
      val edited = benchTokens.updated(20, "zzz").mkString(" ")
      val quoting = (vocab("q", 20) ++ benchTokens.slice(19, 22) ++ vocab("r", 20)).mkString(" ")
      val unrelated = vocab("u", 40).mkString(" ")
      Seq(
        (1L, bench, "en", "bench", bench.length.toLong),
        (20L, edited, "en", "web", edited.length.toLong),
        (21L, quoting, "en", "web", quoting.length.toLong),
        (22L, unrelated, "en", "web", unrelated.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val fuzzy = Pipeline.fuzzyDecontaminate(spark, tmp.toString).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // only the edited near-copy is fuzzy-contaminated
      assert(fuzzy("web") == ((3L, 1L)), s"fuzzy: $fuzzy")
      val exact = Pipeline.decontaminate(spark, tmp.toString).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // the any-overlap gate flags the quoting doc too: exact ⊇ fuzzy,
      // and the delta is precisely the should-not-delete mass
      assert(exact("web") == ((3L, 2L)), s"exact: $exact")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("packing plan truncates over-budget documents (constructed corpus)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pack").toFile
    try {
      val mk = (id: Long, n: Int) => (id, Seq.fill(n)("tok").mkString(" "), "en", "srcX", 3L * n)
      val s = spark
      import s.implicits._
      Seq(mk(1L, 600), mk(2L, 10), mk(3L, 500))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = Pipeline.packingPlan(spark, tmp.toString).collect().head
      // stream is 1110 tokens: doc1 crosses 512, doc3 crosses 1024 → 2 splits
      assert(r.getLong(2) === 1110L && r.getLong(3) === 3L && r.getLong(4) === 2L)
      // pad policy: doc1 clips 88 tokens; docs 2/3 pad 502 + 12
      assert(r.getLong(5) === 88L, s"pad_truncated: $r")
      assert(r.getLong(6) === 514L, s"pad_waste: $r")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("data card: outcomes partition each source, rates are genuine fractions, token budget is real") {
    val rows = Pipeline.dataCard(spark, sf).collect()
    assert(rows.nonEmpty, "empty data card")
    rows.foreach { r =>
      val (nDocs, nKeep, nEx, nNear, nQ) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_keep"), r.getAs[Long]("n_exact_dup"),
         r.getAs[Long]("n_near_dup"), r.getAs[Long]("n_quality"))
      // one decision per document: the four outcomes partition the source
      assert(nKeep + nEx + nNear + nQ == nDocs,
        s"${r.getAs[String]("source")}: outcomes don't partition ($nKeep+$nEx+$nNear+$nQ != $nDocs)")
      val rate = r.getAs[Double]("keep_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      if (nKeep > 0) {
        assert(r.getAs[Long]("kept_tokens") > 0, "keeps with zero tokens")
        assert(r.getAs[Long]("mean_keep_tokens") > 0)
      } else assert(r.getAs[Long]("kept_tokens") == 0)
    }
    // the card's outcome counts must agree with the declared manifest
    val manifest = Pipeline.curationManifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_keep") == manifest.getOrElse((src, "keep"), 0L),
        s"$src keep count disagrees with pipe_curation_manifest")
    }
    // non-vacuous: at least one source actually dropped something
    assert(rows.exists(r => r.getAs[Long]("n_keep") < r.getAs[Long]("n_docs")),
      "no source dropped anything — the gates did no work on this corpus")
  }
}
