package graft.ops

import org.apache.spark.sql.SparkSession

/** SHARED-INDEX build registry for the benchmark harness (round-13
  * verdict #4): every memoized derived relation and persisted index
  * table that more than one declared query consumes, with an explicit
  * name — so [[graft.Bench]] forces them in a dedicated pass and each
  * build's cost lands on its own `build:<name>` row instead of on
  * whichever consumer query happens to run first (r13's
  * `dedup_ngram_seg` swung 1.7 s → 4.1 s across rounds purely from
  * build-attribution drift).
  *
  * The list is ORDERED dependency-first (e.g. simhash before the pairs
  * built from it, shingles before components), so each row prices its
  * MARGINAL build — exactly the build-vs-consume split SCALECHECK.md
  * prices, now visible in every bench run. Total bench time is
  * unchanged by construction: these builds always ran; they were just
  * mis-attributed.
  *
  * Memoized relations materialize on first access
  * ([[Tables.memoized]]'s eager localCheckpoint); ensure* persisted
  * tables build on first ensure — both make "force" a plain call. */
object Prebuild {

  /** (name, force) — name becomes the bench row `build:<name>`.
    * Round-17 note: a guide-§2.6 overlapped build pass (3 rows of a
    * dependency stage in flight) was tried and REVERTED — on this
    * single-node harness it made wall-clock worse (60 s vs ~48 s) and
    * inflated per-row attribution 2-4×; see OPTIMIZATION_r17.md §4. */
  def builds: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    // ---- text/dedup signature + pair relations (memoized) ----
    "shingles"           -> ((s, d) => { Dedup.shingles(s, d); () }),
    "shingle_pair_stats" -> ((s, d) => { Dedup.shinglePairStats(s, d); () }),
    "ngram_components"   -> ((s, d) => { Dedup.ngramComponents(s, d); () }),
    // per-document Gopher rule flags + the full-corpus decision relation
    // (round-17: both memoized — flags feed every decisionsFrom variant,
    // decisions feed manifest/cards/admit-divergence/runs)
    "gopher_flags"       -> ((s, d) => { Pipeline.gopherFlags(s, d); () }),
    "curation_decisions" -> ((s, d) => { Pipeline.curationDecisions(s, d); () }),
    "simhash"            -> ((s, d) => { Dedup.simhashRaw(s, d); () }),
    "hamming_pairs"      -> ((s, d) => { Dedup.hammingPairs3(s, d); () }),
    "hamming_components" -> ((s, d) => { Dedup.hammingComponents(s, d); () }),
    "fuzzy_pairs"        -> ((s, d) => { Dedup.fuzzyPairs10(s, d); () }),
    // ---- embedding relations (memoized) ----
    "vectors"            -> ((s, d) => { Similarity.vectors(s, d); () }),
    "ivf_seed_assign"    -> ((s, d) => { Similarity.seedAssignment(s, d); () }),
    "moments"            -> ((s, d) => { Similarity.moments(s, d); () }),
    "sq8_codes"          -> ((s, d) => Similarity.ensureSq8Codes(s, d)),
    // ---- media signatures (memoized; decode-once contract) ----
    "phash"              -> ((s, d) => { Multimodal.phashRaw(s, d); () }),
    // ---- persisted index tables (warehouse, ensure-once) ----
    "idx_simhash_chunks" -> ((s, d) => { IndexTables.ensureChunkIndex(s, d, 4); () }),
    "idx_phash_chunks"   -> ((s, d) => { IndexTables.ensurePhashIndex(s, d, 4); () }),
    "idx_minhash"        -> ((s, d) => { IndexTables.ensureMinhashIndex(s, d); () }),
    "idx_shingles"       -> ((s, d) => { IndexTables.ensureShingleIndex(s, d); () }),
    "idx_shingle_seg"    -> ((s, d) => { IndexTables.ensureShingleSegments(s, d); () }),
    // segment-served components ride the segment index (dedup_ngram_seg)
    "ngram_components_seg" -> ((s, d) => { Dedup.ngramComponentsSegmented(s, d); () }),
    "idx_bpe_vocab"      -> ((s, d) => { IndexTables.ensureBpeVocab(s, d, 10); () }),
    // bucketed unigram postings + dl/df/corp stat side tables
    // (round-15/16; text_bm25_indexed, ann_hybrid_rrf)
    "idx_postings"       -> ((s, d) => { IndexTables.postingsIndexTables(s, d); () }),
    // positional postings — the family's optional fifth table
    // (round-16; text_phrase_indexed)
    "idx_postings_pos"   -> ((s, d) => { IndexTables.ensurePositionalPostings(s, d); () }),
    // sample-trained full-corpus vocabulary (round-15; text_bpe_encode_sampled)
    "bpe_vocab_sampled"  -> ((s, d) => { TextAnalysis.sampledVocab(s, d, 10, 0.5); () }),
    "idx_prefix"         -> ((s, d) => { IndexTables.ensurePrefixIndex(s, d, 32); () }),
    "idx_ivf"            -> ((s, d) => { IndexTables.ensureIvfIndex(s, d); () }),
    "idx_pq"             -> ((s, d) => { IndexTables.ensurePqIndex(s, d); () }),
    "idx_sem_comp"       -> ((s, d) => { IndexTables.ensureSemanticComponents(s, d, 0.4); () }),
    // ---- admission assets (digest index + base-slice segments) ----
    "admission_assets"   -> ((s, d) => {
      val maxId = Tables.documents(s, d)
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("doc_id"))).head().getLong(0)
      Pipeline.ensureAdmissionAssets(s, d, 9L * maxId / 10L)
    }),
    // ---- lifecycle prior-run fixture stores (round-13 verdict #5) ----
    "fixture_takedown"   -> ((s, d) => { CurationRun.ensureTakedownFixture(s, d); () }),
    "fixture_delta"      -> ((s, d) => { CurationRun.ensureDeltaFixture(s, d); () }))
}
