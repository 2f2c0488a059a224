package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The persisted-index story, executable: building the bucketed index
  * tables and plan-proving that the pair-generation self-joins over
  * them run WITHOUT a runtime Exchange (the shuffle was paid once, at
  * index-build time) — and that the indexed consumers return exactly
  * the same rows as their in-plan twins. Broadcast is disabled for the
  * plan assertions: at 100 TB neither side of these joins broadcasts,
  * so the exchange-free sort-merge shape is the one that matters. */
class IndexTablesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"
  private def hasTestData = new java.io.File(s"$sf/documents.parquet").isFile

  private def withNoBroadcast[A](body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("chunk-index self-join plans exchange-free on both sides") {
    assume(hasTestData)
    val idx = spark.table(IndexTables.ensureChunkIndex(spark, sf, 4))
    withNoBroadcast {
      val joined = idx.as("a").join(idx.as("b"),
        col("a.j") === col("b.j") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"index self-join must not shuffle the index:\n$plan")
    }
  }

  test("chunk-index sortBy metadata elides the per-query Sort (legacy sorted-scan flag)") {
    assume(hasTestData)
    // The index writes one file per bucket, sorted on the join keys.
    // Spark ≥3.1 only exposes that order to the planner behind the
    // legacy flag (multi-file buckets can't guarantee it; ours are
    // single-file by construction). The default plan above still pays a
    // bucket-LOCAL in-memory sort — never a shuffle; this shows the
    // sort itself is also already paid at write time.
    val idx = spark.table(IndexTables.ensureChunkIndex(spark, sf, 4))
    val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try withNoBroadcast {
      val joined = idx.as("a").join(idx.as("b"),
        col("a.j") === col("b.j") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")
      assert(!plan.contains("Sort "),
        s"write-time sortBy must satisfy the SMJ ordering:\n$plan")
    } finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("shingle-index self-join plans exchange-free on both sides") {
    assume(hasTestData)
    val idx = spark.table(IndexTables.ensureShingleIndex(spark, sf))
    withNoBroadcast {
      val joined = idx.as("a").join(idx.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"index self-join must not shuffle the index:\n$plan")
    }
  }

  test("indexed hamming near-dup returns exactly the in-plan twin's rows") {
    assume(hasTestData)
    val viaIndex = Dedup.hammingNearDupIndexed(spark, sf).collect().map(_.toSeq)
    val inPlan = Dedup.hammingNearDup(spark, sf).collect().map(_.toSeq)
    assert(viaIndex.nonEmpty, "vacuous: no hamming near-dups at test scale")
    assert(viaIndex.toSeq === inPlan.toSeq)
  }

  test("indexed ngram jaccard returns exactly the in-plan twin's rows") {
    assume(hasTestData)
    val viaIndex = Dedup.ngramJaccardIndexed(spark, sf).collect().map(_.toSeq)
    val inPlan = Dedup.ngramJaccard(spark, sf).collect().map(_.toSeq)
    assert(viaIndex.nonEmpty, "vacuous: no ngram near-dups at test scale")
    assert(viaIndex.toSeq === inPlan.toSeq)
  }

  test("IVF indexed search PRUNES the partitioned table to exactly the probed lists") {
    assume(hasTestData)
    IndexTables.ensureIvfIndex(spark, sf)
    // 2 queries × nprobe 2 → at most 4 of the 8 lists probed: pruning
    // is observable, not vacuous (8 queries can legitimately touch all
    // 8 lists at this tiny scale)
    val nQueries = 2
    val expected = Similarity.probedLists(spark, sf, nQueries, nprobe = 2)
    assert(expected.size < Similarity.IvfNList,
      s"probe set covers every list (${expected.size}) — pruning unobservable")
    val df = Similarity.ivfTopKIndexed(spark, sf, nQueries = nQueries)
    df.collect()
    // descend through AQE stages and subqueries — the scan lives inside
    // a materialized QueryStage after execution
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      here ++ (p.children ++ nested ++ p.subqueries).flatMap(allScans)
    }
    val plan = df.queryExecution.executedPlan
    val scans = allScans(plan)
      .filter(_.tableIdentifier.exists(_.table.startsWith("idx_ivf_seed_")))
    assert(scans.nonEmpty, s"no FileSourceScan of the ivf table in:\n$plan")
    // the probe predicate must reach the scan as a PARTITION filter
    // (the driver-side probe selection becomes a literal IN on
    // list_id), and the partitions-read metric must equal the
    // probed-list count — the entire point of PARTITIONED BY list_id
    val scan = scans.head
    assert(scan.partitionFilters.exists(f =>
        f.toString.contains("list_id") && f.toString.contains("IN")),
      s"no probe-list IN filter on the ivf scan; partitionFilters=${scan.partitionFilters}")
    val partitionsRead = scan.metrics("numPartitions").value
    assert(partitionsRead == expected.size.toLong,
      s"scanned $partitionsRead partitions, expected ${expected.size} (lists $expected)")
  }

  test("IVF index is partitioned by list_id and the indexed search matches the in-plan twin") {
    assume(hasTestData)
    val name = IndexTables.ensureIvfIndex(spark, sf)
    // layout: one partition directory per inverted list
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(warehouse, name))
      .filter(_.isDirectory).map(_.getPath.getName).filter(_.startsWith("list_id="))
    assert(dirs.length == Similarity.IvfNList,
      s"expected ${Similarity.IvfNList} list partitions, got ${dirs.toSeq}")
    // every vector assigned exactly once (the table IS the inverted index)
    assert(spark.table(name).count() ==
      graft.ops.Tables.embeddings(spark, sf).count())
    val viaIndex = Similarity.ivfTopKIndexed(spark, sf).collect().map(_.toSeq)
    val inPlan = Similarity.ivfTopK(spark, sf).collect().map(_.toSeq)
    assert(viaIndex.nonEmpty)
    assert(viaIndex.toSeq === inPlan.toSeq)
    // the indexed consumer's plan reads the persisted table, not a
    // recomputed assignment
    val plan = Similarity.ivfTopKIndexed(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains(name), s"expected a scan of $name in:\n$plan")
  }

  test("chunk index maintains INCREMENTALLY: appended docs stay exchange-free and immediately findable") {
    assume(hasTestData)
    // nChunks=5 → a dedicated table; the shared nChunks=4 index other
    // tests compare against the in-plan twin stays untouched
    val name = IndexTables.ensureChunkIndex(spark, sf, 5)
    val before = spark.table(name).count()
    // the new doc is an exact text twin of an existing one: identical
    // simhash, so the blocked join must surface the pair at distance 0
    val existing = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(1).collect()(0)
    val newId = 900000001L
    val newDoc = spark.createDataFrame(Seq((newId, existing.getString(1))))
      .toDF("doc_id", "text")
    assert(IndexTables.appendToChunkIndex(spark, sf, 5, newDoc) == 5L)
    val idx = spark.table(name)
    assert(idx.count() == before + 5)
    // bucket locality survives the append: the candidate self-join over
    // the appended table still plans with no Exchange on either side
    withNoBroadcast {
      val joined = idx.as("a").join(idx.as("b"),
        col("a.j") === col("b.j") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"appended index lost bucket-join locality:\n$plan")
    }
    // and the appended doc is immediately findable as a near-dup
    val hit = Dedup.pairsFromChunks(idx, 5)
      .filter(col("doc_b") === newId &&
              col("doc_a") === existing.getLong(0))
      .select(expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("dist"))
      .collect()
    assert(hit.length == 1 && hit(0).getLong(0) == 0L,
      s"appended twin not found at distance 0: ${hit.toSeq}")
  }

  test("chunk-index compaction collapses replayed at-least-once rows and keeps the bucket join exchange-free") {
    assume(hasTestData)
    // nChunks=6 → a dedicated table; the shared nChunks=4/5 tables other
    // tests mutate or compare against stay untouched
    val name = IndexTables.ensureChunkIndex(spark, sf, 6)
    val clean = spark.table(name).count()
    val batch = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id") + 800000000L as "doc_id", col("text"))
      .orderBy(col("doc_id")).limit(3)
    // the same batch lands twice — the streaming gate's replay shape
    assert(IndexTables.appendToChunkIndex(spark, sf, 6, batch) == 18L)
    assert(IndexTables.appendToChunkIndex(spark, sf, 6, batch) == 18L)
    assert(spark.table(name).count() == clean + 36)
    val pairsBefore = Dedup.pairsFromChunks(spark.table(name), 6)
      .select(col("doc_a"), col("doc_b")).distinct().count()
    val (before, after) = IndexTables.compactChunkIndex(spark, sf, 6)
    assert(before == clean + 36 && after == clean + 18,
      s"compaction must keep exactly one copy of the replayed rows: $before -> $after")
    // same candidates served, and the re-clustered table still joins
    // with no Exchange (the rewrite restored the bucket layout)
    val pairsAfter = Dedup.pairsFromChunks(spark.table(name), 6)
      .select(col("doc_a"), col("doc_b")).distinct().count()
    assert(pairsAfter == pairsBefore, "compaction changed the candidate pair set")
    withNoBroadcast {
      val idx = spark.table(name)
      val joined = idx.as("a").join(idx.as("b"),
        col("a.j") === col("b.j") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"compacted index lost bucket-join locality:\n$plan")
    }
  }

  test("a crashed compaction swap is repaired from the staged table, not rebuilt from dir") {
    assume(hasTestData)
    // nChunks=7 → dedicated table
    val name = IndexTables.ensureChunkIndex(spark, sf, 7)
    val marker = spark.createDataFrame(Seq((700000001L, "staged swap survivor row")))
      .toDF("doc_id", "text")
    assert(IndexTables.appendToChunkIndex(spark, sf, 7, marker) == 7L)
    val withMarker = spark.table(name).count()
    // simulate a crash between "DROP final" and "RENAME staged": the
    // complete replacement sits under _stage, the final name is gone
    spark.sql(s"ALTER TABLE $name RENAME TO ${name}_stage")
    // the next ensure must complete the swap — a from-dir rebuild would
    // silently lose the appended marker doc
    IndexTables.ensureChunkIndex(spark, sf, 7)
    assert(spark.table(name).count() == withMarker,
      "repair lost rows that only existed in the staged table")
    assert(spark.table(name).filter(col("doc_id") === 700000001L).count() == 7L,
      "appended rows not recovered from the staged table")
    assert(!spark.catalog.tableExists(s"${name}_stage"))
  }

  test("IVF index maintains INCREMENTALLY: new vectors land in their frozen-quantizer lists") {
    // mutates sf0.01's IVF table only — disjoint from the sf0.001
    // twin-identity tables and from StreamingNearDupSpec's sf0.01
    // CHUNK-index mutation, so parallel suites cannot race
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").isFile)
    val name = IndexTables.ensureIvfIndex(spark, dir)
    val before = spark.table(name).count()
    // the new vector is an exact copy of an existing non-centroid
    // vector: the frozen quantizer must assign it to its twin's list
    val twin = graft.ops.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0L).select(col("embedding")).head().getSeq[Float](0)
    val newId = 900000001L
    val newDf = spark.createDataFrame(Seq((newId, twin))).toDF("vec_id", "embedding")
    assert(IndexTables.appendToIvfIndex(spark, dir, newDf) == 1L)
    val idx = spark.table(name)
    assert(idx.count() == before + 1)
    def listOf(id: Long): Long =
      idx.filter(col("n_id") === id).select(col("list_id").cast("long")).head().getLong(0)
    assert(listOf(newId) == listOf(0L),
      "appended twin vector not assigned to its twin's inverted list")
  }

  test("minhash band index: exchange-free self-join, twin identity, incremental append") {
    assume(hasTestData)
    val name = IndexTables.ensureMinhashIndex(spark, sf)
    val idx = spark.table(name)
    withNoBroadcast {
      val joined = idx.as("a").join(idx.as("b"),
        col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"band-index self-join must not shuffle the index:\n$plan")
    }
    val viaIndex = Dedup.minhashLshIndexed(spark, sf).collect().map(_.toSeq)
    val inPlan = Dedup.minhashLsh(spark, sf).collect().map(_.toSeq)
    assert(viaIndex.nonEmpty, "vacuous: no minhash near-dups at test scale")
    assert(viaIndex.toSeq === inPlan.toSeq)
  }

  test("minhash band index maintains INCREMENTALLY: a text twin lands in its twin's buckets") {
    // mutates sf0.01's band table only — the sf0.001 twin-identity
    // table above (and the declared query) stay untouched, same
    // isolation rule as the IVF/PQ append tests
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/documents.parquet").isFile)
    val name = IndexTables.ensureMinhashIndex(spark, dir)
    val existing = graft.ops.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).limit(1).collect()(0)
    val newId = 910000001L
    val newDoc = spark.createDataFrame(Seq((newId, existing.getString(1))))
      .toDF("doc_id", "text")
    val before = spark.table(name).count()
    assert(IndexTables.appendToMinhashIndex(spark, dir, newDoc) == 3L)
    val after = spark.table(name)
    assert(after.count() == before + 3)
    def bandsOf(id: Long): Set[(Int, String)] =
      after.filter(col("doc_id") === id)
        .select(col("bi"), col("bk")).collect()
        .map(r => (r.getInt(0), r.getString(1))).toSet
    assert(bandsOf(newId) == bandsOf(existing.getLong(0)),
      "appended twin's bands differ from its identical-text twin")
    // bucket locality survives the append
    withNoBroadcast {
      val idx = spark.table(name)
      val joined = idx.as("a").join(idx.as("b"),
        col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        s"appended band index lost bucket-join locality:\n$plan")
    }
  }

  test("IVF-PQ search PRUNES the code table to exactly the probed lists") {
    assume(hasTestData)
    IndexTables.ensurePqIndex(spark, sf)
    // 2 queries × nprobe 2 → at most 4 of the 8 lists probed (the IVF
    // pruning test's rationale: pruning must be observable)
    val nQueries = 2
    val expected = Similarity.probedLists(spark, sf, nQueries, nprobe = 2)
    assert(expected.size < Similarity.IvfNList,
      s"probe set covers every list (${expected.size}) — pruning unobservable")
    val df = Similarity.ivfPqTopK(spark, sf, nQueries = nQueries)
    df.collect()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Seq.empty
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      here ++ (p.children ++ nested ++ p.subqueries).flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.tableIdentifier.exists(_.table.startsWith("idx_pq_codes_")))
    assert(scans.nonEmpty, "no FileSourceScan of the PQ code table in the plan")
    val scan = scans.head
    assert(scan.partitionFilters.exists(f =>
        f.toString.contains("list_id") && f.toString.contains("IN")),
      s"no probe-list IN filter on the code scan; partitionFilters=${scan.partitionFilters}")
    val partitionsRead = scan.metrics("numPartitions").value
    assert(partitionsRead == expected.size.toLong,
      s"scanned $partitionsRead partitions, expected ${expected.size} (lists $expected)")
  }

  test("PQ code table maintains INCREMENTALLY: a twin vector gets its twin's codes in its twin's list") {
    // mutates sf0.01's PQ table only (same isolation note as the IVF
    // append test above)
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").isFile)
    val name = IndexTables.ensurePqIndex(spark, dir)
    val before = spark.table(name).count()
    // PqM code rows per vector, one per subspace
    assert(before == graft.ops.Tables.embeddings(spark, dir).count() * Similarity.PqM)
    val twin = graft.ops.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 1L).select(col("embedding")).head().getSeq[Float](0)
    val newId = 900000002L
    val newDf = spark.createDataFrame(Seq((newId, twin))).toDF("vec_id", "embedding")
    assert(IndexTables.appendToPqIndex(spark, dir, newDf) == 1L)
    val idx = spark.table(name)
    assert(idx.count() == before + Similarity.PqM)
    // the frozen codebook + frozen quantizer must reproduce the twin's
    // exact (m → code_id) encoding AND its inverted list
    def codesOf(id: Long): Seq[(Long, Long, Long)] =
      idx.filter(col("n_id") === id)
        .select(col("m").cast("long"), col("code_id").cast("long"),
                col("list_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(codesOf(newId) == codesOf(1L),
      "appended twin's codes/list differ from its identical-vector twin")
    // END-TO-END serving: the PAIRED append (codes + vectors — the
    // documented IVFPQ ingest contract) must surface the new vector in
    // SERVED results, not just in the code table: pick a twin source
    // that lives in a list the default query set actually probes, so
    // the appended id reaches the ADC scan, the shortlist, AND the
    // rerank (which reads the IVF index — codes appended alone would
    // be shortlisted and then dropped at the rerank join)
    val probed = Similarity.probedLists(spark, dir, nQueries = 8, nprobe = 2).toSet
    val ivfIdx = spark.table(IndexTables.ensureIvfIndex(spark, dir))
    val srcId = ivfIdx
      .filter(col("list_id").cast("long").isin(probed.toSeq: _*) && col("n_id") >= 200L)
      .select(col("n_id").cast("long")).orderBy(col("n_id")).head().getLong(0)
    val srcEmb = graft.ops.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === srcId).select(col("embedding")).head().getSeq[Float](0)
    val servedId = 900000003L
    val servedDf = spark.createDataFrame(Seq((servedId, srcEmb))).toDF("vec_id", "embedding")
    assert(IndexTables.appendToPqIndex(spark, dir, servedDf) == 1L)
    assert(IndexTables.appendToIvfIndex(spark, dir, servedDf) == 1L)
    // wide k + shortlist so presence, not rank, is what's asserted
    val served = Similarity.ivfPqTopK(spark, dir, nQueries = 8, k = 4000, shortlist = 100000)
      .filter(col("neighbor_id") === servedId || col("neighbor_id") === srcId)
      .select(col("query_id"), col("neighbor_id"), col("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byQuery = served.groupBy(_._1)
    assert(byQuery.nonEmpty, "neither twin served — probe/list selection broken")
    val twinned = byQuery.values.filter(_.map(_._2).toSet == Set(servedId, srcId))
    assert(twinned.nonEmpty,
      s"appended vector never served next to its twin: ${served.toSeq.take(10)}")
    twinned.foreach { rows =>
      assert(rows.map(_._3).distinct.length == 1,
        s"identical twin vectors served with different cosines: ${rows.toSeq}")
    }
  }

  test("index builds are idempotent per catalog (second ensure is a no-op)") {
    assume(hasTestData)
    val t1 = IndexTables.ensureChunkIndex(spark, sf, 4)
    val countBefore = spark.table(t1).count()
    val t2 = IndexTables.ensureChunkIndex(spark, sf, 4)
    assert(t1 === t2)
    assert(spark.table(t2).count() === countBefore)
  }

  test("persisted media pHash index: identical pair set to the in-plan twin, Exchange-free self-join") {
    assume(hasTestData)
    val viaIndex = Multimodal.phashNearDupIndexed(spark, sf).collect().map(_.toSeq)
    val inPlan = Multimodal.phashNearDup(spark, sf).collect().map(_.toSeq)
    assert(viaIndex.nonEmpty, "vacuous: no media near-dups at test scale")
    assert(viaIndex.toSeq === inPlan.toSeq)
    // the decode-once table joins bucket-locally like every chunk index
    val idx = spark.table(IndexTables.ensurePhashIndex(spark, sf, 4))
    withNoBroadcast {
      val joined = idx.as("a").join(idx.as("b"),
        col("a.j") === col("b.j") && col("a.ck") === col("b.ck") &&
        col("a.doc_id") < col("b.doc_id"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange"),
        s"media index self-join must not shuffle the index:\n$plan")
    }
  }
}
