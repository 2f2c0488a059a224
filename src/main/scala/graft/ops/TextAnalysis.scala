package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language ID heuristic,
  * quality scoring, token counting, fingerprinting, and the
  * binary/multimodal metadata path. All single-pass, codegen-friendly
  * column expressions — no UDFs — so they run at scan speed and are
  * exactly replayable by the SQL oracle.
  */
object TextAnalysis {

  import Tables.trunc6

  /** Per-doc quality metrics + composite score. One projection over the
    * scan; every metric is a pure column expression. */
  /** Shared per-document text-signal derivations over a token-array
    * column `w`: appends (n_tokens, sum_len, n_stop, n_en,
    * avg_token_len, stop_ratio, en_ratio, quality_score). ONE
    * definition of the marker-token lists and the composite-score
    * algebra for every consumer — [[quality]], [[langId]], and the
    * curation gates ([[graft.ops.Pipeline]]'s `gated`) — because two
    * drifting inline copies was a review finding (the same lesson
    * `Tables.trunc6`'s doc records for the truncation scheme). Gate
    * THRESHOLDS (score ≥ 0.6, en_ratio ≥ 0.05) stay with their
    * consumers; the signal algebra lives here. Catalyst's column
    * pruning drops whatever a consumer never reads, so sharing the
    * full set costs nothing. */
  private[ops] def textSignals(df: DataFrame, w: String): DataFrame =
    df.withColumn("n_tokens", size(col(w)).cast("long"))
      .withColumn("sum_len",
        expr(s"aggregate(transform($w, x -> length(x)), 0L, (acc, x) -> acc + x)"))
      .withColumn("n_stop", expr(
        s"CAST(size(filter($w, t -> t = 'the' OR t = 'a' OR t = 'of' OR t = 'and')) AS BIGINT)"))
      .withColumn("n_en", expr(
        s"CAST(size(filter($w, t -> t = 'the' OR t = 'a' OR t = 'of')) AS BIGINT)"))
      .withColumn("avg_token_len",
        trunc6(col("sum_len").cast("double") / col("n_tokens")))
      .withColumn("stop_ratio",
        trunc6(col("n_stop").cast("double") / col("n_tokens")))
      .withColumn("en_ratio", trunc6(col("n_en").cast("double") / col("n_tokens")))
      .withColumn("quality_score", trunc6(
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.4 +
        (lit(1.0) - col("stop_ratio")) * 0.3 +
        least(col("avg_token_len") / 8.0, lit(1.0)) * 0.3))

  def quality(s: SparkSession, dir: String): DataFrame =
    textSignals(Tables.documents(s, dir).withColumn("w", split(col("text"), " ")), "w")
      .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
              col("stop_ratio"), col("quality_score"))
      .orderBy(col("doc_id"))

  /** N-gram-heuristic language ID: marker-token ratios decide the
    * predicted language; emitted next to the labeled `lang` so
    * downstream can measure agreement. */
  def langId(s: SparkSession, dir: String): DataFrame =
    textSignals(Tables.documents(s, dir).withColumn("w", split(col("text"), " ")), "w")
      .withColumn("lang_pred",
        when(col("en_ratio") >= 0.05, lit("en")).otherwise(lit("unknown")))
      .select(col("doc_id"), col("lang").as("lang_label"), col("lang_pred"),
              col("en_ratio"), col("n_tokens"))
      .orderBy(col("doc_id"))

  /** Token counting per source: whitespace tokens vs a BPE-ish
    * word/number regex, aggregated map-side then one small shuffle. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("re_tokens",
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("ws_tokens")).as("total_ws_tokens"),
           sum(col("re_tokens")).as("total_re_tokens"),
           max(col("ws_tokens")).as("max_ws_tokens"))
      .orderBy(col("source"))

  /** Document fingerprint: md5 over the sorted token multiset — a
    * shuffle-free canonical hash that collapses word-order permutations;
    * grouped to expose collision clusters (near-dup candidates). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("fp", md5(array_join(array_sort(split(col("text"), " ")), " ")))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("fp"))

  /** Order-sensitive document fingerprint: a polynomial rolling hash
    * over the token SEQUENCE (vs [[fingerprint]]'s order-free sorted
    * multiset) — `h = fold(tokens, (acc, t) -> (acc*31 + v(t)) mod 1e9+7)`
    * with v(t) the first 16 bits of md5(t). Detects exact sequence
    * reuse (boilerplate, templated spam) that multiset hashing misses.
    * Pure fold inside `aggregate` — single pass, codegen'd, and the
    * modulus keeps every intermediate in BIGINT range on both engines. */
  def rollingHash(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("vals", expr(
        "transform(split(text, ' '), t -> CAST(conv(substr(md5(t), 1, 4), 16, 10) AS BIGINT))"))
      .withColumn("roll_hash", expr(
        "aggregate(vals, CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % 1000000007)"))
      .select(col("doc_id"), col("roll_hash"))
      .orderBy(col("doc_id"))

  /** TF-IDF-style distinctive terms: each document's top-3 tokens ranked
    * by (term frequency DESC, corpus document frequency ASC, token) —
    * the highest-tf, lowest-df terms are what characterizes a doc
    * against the corpus. Ranking on INTEGERS only (no float idf), so the
    * result is exactly replayable: tf·log(N/df) would rank identically
    * for fixed tf but is summation/libm-dependent across engines.
    * Two aggregations (per-doc tf, corpus df — both map-side combined)
    * + a bounded top-k aggregate ([[graft.functions.TopKPairs]]) with a
    * composite `struct(tf, -df)` score and the token as a STRING
    * payload — the row_number window this replaces had to shuffle and
    * sort every (doc, token) row; the aggregate ships ≤k tokens per doc
    * per partition. At 100 TB df is the only corpus-wide shuffle and it
    * is keyed on the token, the same partitioning dedup already uses.
    * Rank is recovered from the array position; df from the negated
    * score field — no join back, no window. */
  /** The unigram POSTINGS relation — (term, doc_id, tf), the inverted
    * index's row set and the one tokenize+count pass every lexical
    * scorer here shares. */
  private[ops] def unigramPostings(s: SparkSession, dir: String): DataFrame =
    unigramPostingsOf(Tables.documents(s, dir))

  /** [[unigramPostings]] over an arbitrary (doc_id, text) relation —
    * the incremental form the postings-index APPEND path tokenizes a
    * newly-ingested batch with ([[IndexTables.appendToPostingsIndex]]):
    * one derivation for builds and appends, so the two can never
    * diverge on tokenization (the same single-definition rule every
    * signature family here follows — simhashOf, shinglesOf). */
  private[ops] def unigramPostingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))

  /** BM25 LEXICAL RETRIEVAL (round 15) — the keyword-side twin of the
    * ANN family, completing hybrid search: per query document (vec-
    * family convention: doc_id < nQueries), the top-k OTHER documents
    * by Okapi BM25 over the query's terms (more-like-this — the shape
    * fuzzy decontamination lookups and lexical RAG baselines run).
    * k1 = 1.2, b = 0.75 (the standard constants).
    *
    * Exact cross-engine replay (the DSIR convention): idf is truncated
    * to INTEGER MICRO-UNITS immediately after the one ln() —
    * `floor(ln((N - df + 0.5)/(df + 0.5) + 1) * 1e6)` over exact
    * BIGINT corpus stats — and each term's contribution is floored to
    * micro-units before the per-document SUM, so the aggregate is
    * integer-exact and ORDER-FREE (a double sum's partition order
    * would make ranks nondeterministic). Ranking is (score_u DESC,
    * doc_id ASC) via the native bounded top-k aggregate.
    *
    * Scale shape: the candidate set is docs sharing ≥ 1 query term
    * (the inverted-index bound — never all-pairs); the query-term,
    * idf, and corpus-stat relations are query-sized and broadcast; the
    * postings relation streams once. ≤ k rows per query cross the
    * final shuffle. The persisted twin ([[bm25TopKIndexed]]) reads the
    * postings off the bucketed index table so the probe is a bucket-
    * local join with no tokenize pass. */
  def bm25TopK(s: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    // five consumers downstream (dl→corp, dfr, the query slice, the
    // candidate join) — materialize the tokenize+tf pass once instead
    // of re-exploding the corpus per consumer (the lmBigram pattern;
    // the indexed twin reads the persisted table and never pays this)
    val posts = unigramPostings(s, dir).localCheckpoint()
    val dl = posts.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val corp = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tl"))
    val dfr = posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25Over(s, posts, dl, dfr, corp, nQueries, k)
  }

  /** [[bm25TopK]] served from the PERSISTED postings table
    * ([[IndexTables.ensurePostingsIndex]], bucketed by term) AND its
    * corpus-stat SIDE TABLES (round-16 verdict #1): dl (per-doc
    * length, bucketed by doc_id), df (per-term document frequency,
    * bucketed by term) and the (n, tl) corpus totals are READ, never
    * re-derived — the probe pays no corpus-sized aggregate. The stat
    * tables are delta relations maintained by the same append/purge
    * paths as the postings rows ([[IndexTables.appendToPostingsIndex]]
    * / [[IndexTables.deleteFromPostingsIndex]]); [[bm25Over]] sums df
    * AFTER the query-term join (query-sized) and the corpus totals
    * over the handful of delta rows, so incremental segments never
    * cost a table-wide pass at probe time. Identical rows BY the
    * shared body; shares `text_bm25_topk`'s oracle text (the
    * twin-alias contract). */
  def bm25TopKIndexed(s: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val t = IndexTables.postingsIndexTables(s, dir)
    bm25Over(s, s.table(t.postings), s.table(t.dl), s.table(t.df),
      s.table(t.corp), nQueries, k)
  }

  /** The shared BM25 body. `dl` is one (doc_id, dl) row per document
    * (the stat tables' append gate guarantees it); `dfr` may carry
    * DELTA rows per term (incremental segments) — df is summed after
    * the query-term join, so deltas merge at query cost; `corpDeltas`
    * is any number of (n, tl) delta rows, totaled here (bounded by
    * segment count, never corpus size). */
  private def bm25Over(s: SparkSession, posts: DataFrame, dl: DataFrame,
                       dfr: DataFrame, corpDeltas: DataFrame,
                       nQueries: Int, k: Int): DataFrame = {
    graft.functions.TopKPairs.register(s)
    val corp = corpDeltas.agg(sum(col("n")).as("n"), sum(col("tl")).as("tl"))
    // the query slice is a doc_id filter over a TERM-bucketed relation —
    // a full pass of the postings — and has two consumers (the idf term
    // set + the broadcast candidate probe): materialize the query-sized
    // rows once so the probe pays one slice pass, not two
    val q = posts.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("term"))
      .localCheckpoint()
    // idf of QUERY terms only — query-sized, broadcastable; the df sum
    // lands AFTER the join, so a delta-segmented df table merges at
    // query size (for the in-plan single-row-per-term form the sum is
    // the identity)
    val idf = q.select(col("term")).distinct()
      .join(dfr, Seq("term"))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .crossJoin(broadcast(corp))
      .select(col("term"), expr(
        "CAST(FLOOR(LN((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0) * 1000000) AS BIGINT)")
        .as("idf_u"))
    val scored = posts
      .join(broadcast(q), Seq("term"))
      .filter(col("doc_id") =!= col("query_id"))
      .join(broadcast(idf), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corp))
      // micro-unit term contribution: every double op is the same
      // left-associated expression on both engines, floored before the
      // order-free integer SUM
      .select(col("query_id"), col("doc_id"), expr(
        "CAST(FLOOR(idf_u * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n / CAST(tl AS DOUBLE)))) AS BIGINT)")
        .as("term_u"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_u")).as("score_u"))
    scored.groupBy(col("query_id"))
      .agg(expr(s"graft_topk(score_u, doc_id, $k)").as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.payload").as("doc_id"),
              (col("pos") + 1).cast("long").as("rk"), col("e.score").as("score_u"))
      .withColumn("score", col("score_u").cast("double") / lit(1000000.0))
      .orderBy(col("query_id"), col("rk"))
  }

  /** POSITIONAL postings — (doc_id, pos, term), pos 1-based over the
    * whitespace-split array (empty tokens dropped, their indices kept,
    * so positions replay identically in the DuckDB oracle). The
    * position-bearing sibling of [[unigramPostings]]: phrase/adjacency
    * queries need WHERE a term sits, not just how often. */
  private[ops] def positionalPostings(s: SparkSession, dir: String): DataFrame =
    positionalPostingsOf(Tables.documents(s, dir))

  /** [[positionalPostings]] over an arbitrary (doc_id, text) relation —
    * the incremental form the positional-index append path uses (one
    * derivation for builds and appends, like [[unigramPostingsOf]]). */
  private[ops] def positionalPostingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .filter(col("term") =!= "")
      .select(col("doc_id"), (col("pos0") + lit(1)).cast("long").as("pos"), col("term"))

  /** PHRASE top-k (round-16): each query doc's FIRST bigram (its first
    * two whitespace tokens) is its phrase; for each query, the top-k
    * OTHER docs by exact-adjacency occurrence count (ties on doc_id).
    * The retrieval shape a dedup/contamination pipeline uses to chase
    * verbatim n-gram reuse WITH positions — n-gram Jaccard tells you
    * two docs share vocabulary, phrase adjacency tells you they share
    * word ORDER. In-plan form: tokenize-with-positions per run. */
  def phraseTopK(s: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame =
    phraseOver(s, dir, positionalPostings(s, dir), nQueries, k)

  /** [[phraseTopK]] served off the PERSISTED positional postings table
    * ([[IndexTables.ensurePositionalPostings]], bucketed by term — the
    * probe's candidate joins land on the bucket key): the deployment
    * shape, where the tokenize pass is the index build's cost and a
    * probe touches only the two query-term buckets per phrase.
    * Identical rows BY the shared body (the twin-alias contract). */
  def phraseTopKIndexed(s: SparkSession, dir: String, nQueries: Int = 8, k: Int = 5): DataFrame =
    phraseOver(s, dir, s.table(IndexTables.ensurePositionalPostings(s, dir)), nQueries, k)

  /** The shared phrase body. Both candidate legs join the positional
    * relation against a BROADCAST nQueries-row phrase table on term
    * (bucket-pruned on the indexed twin — the index side never
    * shuffles at the scan); only term-frequency-bounded candidates
    * reach the adjacency equi-join on (query_id, doc_id, pos+1), and
    * ≤k rows per query survive the top-k aggregate. Self-matches are
    * excluded (a query doc trivially contains its own first bigram). */
  private def phraseOver(s: SparkSession, dir: String, posts: DataFrame,
                         nQueries: Int, k: Int): DataFrame = {
    graft.functions.TopKPairs.register(s)
    val q = Tables.documents(s, dir).filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("query_id"), element_at(col("w"), 1).as("l"),
              element_at(col("w"), 2).as("r"))
    val c1 = posts.join(broadcast(q.select(col("query_id"), col("l"))),
        posts("term") === col("l"))
      .select(col("query_id"), col("doc_id"), col("pos"))
    val c2 = posts.join(broadcast(q.select(col("query_id").as("qid2"), col("r"))),
        posts("term") === col("r"))
      .select(col("qid2"), col("doc_id").as("did2"), col("pos").as("pos2"))
    val scored = c1.join(c2,
        col("query_id") === col("qid2") && col("doc_id") === col("did2") &&
          col("pos2") === col("pos") + lit(1))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_occ"))
    scored.groupBy(col("query_id"))
      .agg(expr(s"graft_topk(n_occ, doc_id, $k)").as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.payload").as("doc_id"),
              (col("pos") + 1).cast("long").as("rk"), col("e.score").as("n_occ"))
      .orderBy(col("query_id"), col("rk"))
  }

  def topTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    graft.functions.TopKPairs.register(s)
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    toks.join(dfreq, Seq("tok"))
      // (tf DESC, df ASC, tok ASC) ≡ struct(tf, -df) DESC + payload ASC
      .groupBy(col("doc_id"))
      .agg(expr(s"graft_topk(named_struct('tf', tf, 'ndf', -df), tok, $k)").as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), col("col.payload").as("tok"),
        col("col.score.tf").as("tf"), (-col("col.score.ndf")).as("df"),
        (col("pos") + 1).cast("long").as("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Per-SOURCE distinctive-term signatures: [[topTerms]] lifted from
    * documents to sources — each source's top-5 tokens by (source term
    * frequency DESC, cross-source document frequency ASC, token), where
    * df counts how many SOURCES use the token at all. High-tf, low-df
    * tokens are the domain vocabulary that separates one ingest feed
    * from another — the report that catches a mislabeled crawl before
    * it skews a mixture. Same bounded top-k shape: ≤k tokens per source
    * cross the final shuffle regardless of corpus size. */
  def sourceSignatures(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    graft.functions.TopKPairs.register(s)
    val tf = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("tok"))
      .groupBy(col("source"))
      .agg(expr(s"graft_topk(named_struct('tf', tf, 'ndf', -df), tok, $k)").as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), col("col.payload").as("tok"),
        col("col.score.tf").as("tf"), (-col("col.score.ndf")).as("df"),
        (col("pos") + 1).cast("long").as("rk"))
      .orderBy(col("source"), col("rk"))
  }

  /** Bigram-rarity quality signal — the hash-stable core of a language-
    * model-style perplexity score: a document whose word SEQUENCES never
    * recur in the corpus is likely noise/garble, one whose bigrams are
    * all corpus-common is likely boilerplate. Two passes over a
    * (doc_id, bigram) relation: corpus document frequency per bigram,
    * then per-doc counts of hapax bigrams (df = 1). All metrics are
    * INTEGER until the final single division (then trunc6), so the
    * result is order-independent and exactly replayable by the oracle —
    * a float log-prob average would be summation-order-dependent.
    * Scale: same shape as shingle dedup — the df pass is a map-side-
    * combined groupBy on the bigram, the join back is hash-partitioned. */
  def bigramRarity(s: SparkSession, dir: String): DataFrame = {
    val bg = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))")).as("bg"))
      .distinct()
      // two consumers (DF aggregate + join probe): materialize once
      // instead of re-exploding the corpus per consumer
      .localCheckpoint()
    val dfreq = bg.groupBy(col("bg")).agg(count(lit(1)).as("df"))
    bg.join(dfreq, Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("rarity", trunc6(col("n_hapax").cast("double") / col("n_bigrams")))
      .orderBy(col("doc_id"))
  }

  /** Document-length histogram per source: 100-char buckets capped at
    * 900+ — the size-distribution profile a curation run reports next to
    * its quality gates (truncation candidates, empty-doc rates). Pure
    * integer bucketing (div + least), one map-side-combined aggregate. */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", least(expr("n_chars div 100"), lit(9L)))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("n_chars")).as("min_chars"),
           max(col("n_chars")).as("max_chars"))
      .orderBy(col("source"), col("bucket"))

  /** Internal-repetition quality signal (the Gopher/C4-style "repeated
    * n-gram fraction"): a document that keeps repeating its own bigrams/
    * trigrams is templated spam or a generation loop, and curation gates
    * drop it before training. rep_n = 1 - distinct_ngrams/total_ngrams,
    * computed entirely with array expressions (transform + array_distinct)
    * inside ONE projection — no explode, no shuffle, scan-rate at any
    * scale. Ratios go through trunc6 so the oracle replays them exactly. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("bg", expr("transform(sequence(0, size(w)-2), i -> concat(w[i], ' ', w[i+1]))"))
      .withColumn("tg", expr("transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"))
      .select(
        col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bg"))).cast("long").as("n_uniq_bigrams"),
        size(col("tg")).cast("long").as("n_trigrams"),
        size(array_distinct(col("tg"))).cast("long").as("n_uniq_trigrams"))
      .withColumn("rep2", trunc6(lit(1.0) -
        col("n_uniq_bigrams").cast("double") / col("n_bigrams")))
      .withColumn("rep3", trunc6(lit(1.0) -
        col("n_uniq_trigrams").cast("double") / col("n_trigrams")))
      .orderBy(col("doc_id"))

  /** Exact per-source length quantiles (p50/p90/p99 of n_chars) as a
    * TYPE-1 (lower, non-interpolated) quantile: the value at rank
    * ⌈(k/100)·n⌉ under (n_chars, doc_id) order, with the ceiling done
    * as INTEGER division `(k*n + 99) div 100` — no float in the rank
    * math at all (a double `ceil(0.9*n)` rounds differently from a
    * decimal one on exact multiples), so any engine derives the
    * identical report. One window rank + one map-side-combined
    * aggregate; at 100 TB the window partitions by source, which is
    * exactly how the report is consumed. */
  def lengthQuantiles(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    def q(k: Int, name: String) =
      min(when(col("rk") === expr(s"($k * n + 99) div 100"), col("n_chars"))).as(name)
    Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), q(50, "p50"), q(90, "p90"), q(99, "p99"))
      .orderBy(col("source"))
  }

  /** Sketch-based twin of [[lengthQuantiles]]: `percentile_approx`
    * (Spark's built-in Greenwald–Khanna-style quantile sketch) per
    * source — the 100 TB path, where the exact per-stratum rank window
    * has to fully sort every stratum and the sketch aggregates map-side
    * in bounded memory and merges associatively (one row per group
    * crosses the shuffle). The sketch VALUE is engine-specific, so —
    * like `q21_approx_distinct` — the query emits the sketch's
    * CONTRACT in oracle-checkable form: the exact rank quantiles plus a
    * `pNN_ok` flag per percentile, 1 iff the approx value lies between
    * the values at ranks target ∓ (⌊n/accuracy⌋+1) — the sketch's
    * published rank-error guarantee (ε·n with ε = 1/accuracy, +1 for
    * the rank-definition off-by-one between engines). The oracle
    * recomputes the exact quantiles and asserts every flag is 1: the
    * hash gate now verifies the sketch's error bound instead of
    * skipping the query. TextAnalysisSpec keeps the standalone bound
    * proof against the exact twin. */
  def lengthQuantilesApprox(s: SparkSession, dir: String): DataFrame = {
    val acc = 10000
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("n_chars"), col("doc_id"))
    // value at rank clamp(target ∓ slack, 1, n) under the same total
    // order the exact twin ranks by; slack = ⌊n/acc⌋+1
    def at(rankExpr: String, name: String) =
      min(when(col("rk") === expr(rankExpr), col("n_chars"))).as(name)
    def lo(k: Int) = s"greatest(1L, ($k * n + 99) div 100 - (n div $acc + 1))"
    def hi(k: Int) = s"least(n, ($k * n + 99) div 100 + (n div $acc + 1))"
    val bounds = Tables.documents(s, dir)
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           at(s"(50 * n + 99) div 100", "p50"), at(lo(50), "lo50"), at(hi(50), "hi50"),
           at(s"(90 * n + 99) div 100", "p90"), at(lo(90), "lo90"), at(hi(90), "hi90"),
           at(s"(99 * n + 99) div 100", "p99"), at(lo(99), "lo99"), at(hi(99), "hi99"))
    val approx = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(expr(s"percentile_approx(n_chars, array(0.5D, 0.9D, 0.99D), $acc)").as("qs"))
      .select(col("source"),
        col("qs")(0).as("a50"), col("qs")(1).as("a90"), col("qs")(2).as("a99"))
    def ok(a: String, l: String, h: String, name: String) =
      (col(a) >= col(l) && col(a) <= col(h)).cast("long").as(name)
    bounds.join(approx, Seq("source"))
      .select(col("source"), col("n_docs"), col("p50"), col("p90"), col("p99"),
        ok("a50", "lo50", "hi50", "p50_ok"),
        ok("a90", "lo90", "hi90", "p90_ok"),
        ok("a99", "lo99", "hi99", "p99_ok"))
      .orderBy(col("source"))
  }

  /** Collocation extraction (phrase mining): the corpus's top-20 bigrams
    * by document co-occurrence, each with its LIFT — observed doc
    * frequency over the independence expectation N·(df_a/N)·(df_b/N),
    * computed as trunc6(N·df_ab / (df_a·df_b)). High-lift bigrams are
    * multi-word expressions worth protecting from tokenization; counts
    * are integers end-to-end with ONE double division per surviving
    * bigram, so the report replays exactly. Ranking ties break on the
    * bigram text. Shapes: the df passes are map-side-combined groupBys
    * on the bigram/token (same partitioning dedup uses), the tiny token
    * df relation broadcasts back onto 20 rows. */
  def collocations(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val docs = Tables.documents(s, dir)
    // corpus total derived IN-PLAN (constant-key 1-row broadcast, the
    // cappedShingles pattern) — the previous docs.count() dispatched an
    // eager job on every invocation (review-caught)
    val total = docs.agg(count(lit(1)).as("n_docs_total")).withColumn("k", lit(1))
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok")).distinct()
    // vocabulary-sized after the aggregate, but consumed by TWO
    // broadcast joins — checkpoint so the corpus explode runs once
    val tokDf = toks.groupBy(col("tok")).agg(count(lit(1)).as("df")).localCheckpoint()
    val bg = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-2), i -> struct(w[i] AS a, w[i+1] AS b))")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b")).distinct()
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("df_ab"))
    val top = bg.orderBy(col("df_ab").desc, col("a"), col("b")).limit(k)
    top
      .join(broadcast(tokDf.select(col("tok").as("a"), col("df").as("df_a"))), Seq("a"))
      .join(broadcast(tokDf.select(col("tok").as("b"), col("df").as("df_b"))), Seq("b"))
      .withColumn("k", lit(1)).join(broadcast(total), Seq("k"))
      .withColumn("lift", trunc6(
        (col("n_docs_total") * col("df_ab")).cast("double") / (col("df_a") * col("df_b"))))
      .select(col("a"), col("b"), col("df_ab"), col("df_a"), col("df_b"), col("lift"))
      .orderBy(col("df_ab").desc, col("a"), col("b"))
  }

  /** Multimodal metadata path: treat the payload as an opaque binary
    * column (here utf-8 bytes of text stand in for image/audio bytes —
    * the container has no media codecs) and compute typed metadata:
    * byte length, head/tail hex, content hash. The Spark-side plumbing
    * (binary column + per-row metadata projection) is the real pattern;
    * a decoder would slot in as mapPartitions over the same relation
    * (see graft.ops.Multimodal). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("blob", encode(col("text"), "UTF-8"))
      .withColumn("hh", lower(hex(col("blob"))))
      .select(
        col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        substring(col("hh"), 1, 16).as("head_hex"),
        expr("substring(hh, length(hh) - 7, 8)").as("tail_hex"),
        md5(col("text")).as("content_md5"))
      .orderBy(col("doc_id"))

  /** Per-source vocabulary profile: token volume, type count (distinct
    * tokens), within-source hapax count (tokens used exactly once), and
    * the derived type-token + hapax ratios — the lexical-diversity
    * report a curation run reads next to its length histograms (a
    * source whose TTR collapses is template spam; one whose hapax ratio
    * explodes is OCR noise). Two map-side-combined aggregations, keyed
    * (source, token) then source — the same partitioning every token
    * pass here already uses; all metrics integer until the two final
    * divisions (trunc6), so the oracle replays them exactly. */
  def vocabStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf"))
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
           count(lit(1)).as("n_types"),
           sum(when(col("tf") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr", trunc6(col("n_types").cast("double") / col("n_tokens")))
      .withColumn("hapax_ratio", trunc6(col("n_hapax").cast("double") / col("n_types")))
      .orderBy(col("source"))

  /** BPE pair statistics — the first induction step of byte-pair-
    * encoding tokenizer training: corpus-wide frequencies of ADJACENT
    * character pairs inside word types, weighted by word frequency (the
    * exact statistic each BPE merge round maximizes; a full trainer
    * iterates merge → re-pair on the shrinking vocabulary, each round
    * this same aggregate). Two-level aggregation keeps the expensive
    * explode OFF the corpus: tokens reduce to (type, tf) first — the
    * char-pair generate runs once per distinct WORD TYPE, not per
    * occurrence, and at 100 TB the type relation is orders of magnitude
    * smaller than the token stream. Top-k via the bounded
    * [[graft.functions.TopKPairs]] aggregate, (count DESC, pair ASC). */
  def bpePairs(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    graft.functions.TopKPairs.register(s)
    val types = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) >= 2)
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    types
      .select(col("tf"), explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")).as("pair"))
      .groupBy(col("pair")).agg(sum(col("tf")).as("n"))
      // score = n alone: equal counts tie-break toward the SMALLER pair
      // (graft_topk orders ties by payload ascending)
      .groupBy()
      .agg(expr(s"graft_topk(n, pair, $k)").as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("e.payload").as("pair"), col("e.score").as("n"),
              (col("pos") + 1).cast("long").as("rk"))
      .orderBy(col("rk"))
  }

  /** Distributed BPE TRAINER — the full iterative form of [[bpePairs]]:
    * `nMerges` rounds of (count adjacent symbol pairs over word types,
    * weighted by type frequency) → (merge the argmax pair corpus-wide),
    * producing the ranked merge table a tokenizer ships. Each round is
    * ONE map-side-combined pair-count aggregate + a 1-row argmax
    * collect (the merge decision is a global scalar — the same driver
    * pattern as a learned threshold) + a per-TYPE symbol rewrite. The
    * rewrite is a typed `map` over the type relation — sequential
    * left-to-right merging inside one word is inherently order-
    * dependent (("a","a","a") under merge (a,a) → ("aa","a"), not
    * ("a","aa")), which array higher-order functions can't express;
    * per-type state is one word's symbols, and the TYPE relation (not
    * the token stream) is what iterates — at 100 TB it is millions of
    * rows against the corpus's trillions. `localCheckpoint` cuts the
    * per-round lineage exactly as the connected-components loop does.
    * Deterministic: argmax ties break on (left, right) lexicographic
    * under UTF-8 byte order (both engines' string ORDER BY); verified
    * against a sequential reference implementation in `TextAnalysisSpec`
    * AND a full DuckDB oracle that replays the merge rounds as an
    * unrolled chain of CTEs (`bpeTrainOracle` in SparkEntry). */
  def bpeTrain(s: SparkSession, dir: String, nMerges: Int = 10,
               sampleFraction: Double = 1.0): DataFrame = {
    import s.implicits._
    val (merges, _) = trainState(s, dir, nMerges, sampleFraction)
    merges.toDF("rk", "left", "right", "n")
      .withColumn("merged", concat(col("left"), col("right")))
      .select(col("rk"), col("left"), col("right"), col("merged"), col("n"))
      .orderBy(col("rk"))
  }

  /** SAMPLED-corpus BPE training + FULL-corpus encode (round-15 verdict
    * #5) — the shape a production vocabulary needs: the trainer's merge
    * loop is driver-paced (one argmax collect per merge round), fine
    * for the declared 10 merges but not for a 32k-merge tokenizer over
    * 100 TB. The standard escape is to PRICE training on a bounded
    * sample and APPLY the learned merges to everything: here the
    * nMerges sequential rounds iterate only the sampled type relation,
    * and the full corpus pays exactly ONE distributed pass — its type
    * relation is built once and each type's symbols get the learned
    * merge list folded in rank order (the tokenizer's apply), then
    * [[encodeOver]]'s equi-join prices the occurrence stream as usual.
    * Sampling is deterministic and SQL-expressible (`doc_id % 100 <
    * round(fraction*100)`) so the DuckDB oracle replays it exactly;
    * `sampleFraction = 1.0` short-circuits the filter and is
    * byte-identical to [[bpeEncode]] (proven in TextAnalysisSpec). */
  def bpeEncodeSampled(s: SparkSession, dir: String, nMerges: Int = 10,
                       sampleFraction: Double = 0.5): DataFrame =
    encodeOver(s, dir, sampledVocab(s, dir, nMerges, sampleFraction))

  /** The (tok, n_syms) vocabulary of the FULL corpus under merges
    * trained on a sample — memoized per (session, dir, merges, pct)
    * like [[encodedVocab]]. Every full-corpus word type appears (the
    * merge list only changes how types split, never which exist), so
    * the encode join's coverage is identical to full-corpus training. */
  private[ops] def sampledVocab(s: SparkSession, dir: String, nMerges: Int,
                                sampleFraction: Double): DataFrame =
    Tables.memoized(
        s"bpeVocabS${nMerges}_${math.round(sampleFraction * 100)}", s, dir) {
      import s.implicits._
      val (merges, _) = trainState(s, dir, nMerges, sampleFraction)
      val ms = merges.map { case (_, l, r, _) => (l, r) }
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        .as[(String, Long)]
        .map { case (t, _) =>
          val syms = ms.foldLeft(TextAnalysis.codePointSymbols(t)) {
            case (ss, (l, r)) => TextAnalysis.applyMerge(ss, l, r)
          }
          (t, syms.length.toLong)
        }
        .toDF("tok", "n_syms")
    }

  /** The trainer's loop, exposing BOTH outputs: the ranked merge list
    * and the final (token, symbols, tf) type state — the encoded
    * vocabulary [[bpeEncode]] joins back to the corpus. Keeping the
    * original token alongside its symbol sequence costs one extra
    * string per TYPE row (not per occurrence) and is what lets the
    * encode step be a plain equi-join instead of re-running the merge
    * cascade over the token stream. */
  /** [[trainState]] plus the executed ROUND COUNT — the driver-paced
    * Spark-job rounds the batched trainer exists to shrink. */
  private[ops] def trainStateWithRounds(s: SparkSession, dir: String, nMerges: Int,
                         sampleFraction: Double = 1.0, batchMerges: Int = 1)
      : (Seq[(Long, String, String, Long)],
         org.apache.spark.sql.Dataset[(String, Seq[String], Long)], Int) = {
    import s.implicits._
    // Deterministic percent sampling on doc_id — reproducible across
    // runs AND expressible in the DuckDB oracle (no RNG; hundredth
    // granularity is plenty for a training-cost bound). >= 1.0 keeps
    // the plan byte-identical to the unsampled trainer.
    val corpus =
      if (sampleFraction >= 1.0) Tables.documents(s, dir)
      else Tables.documents(s, dir)
        .filter(pmod(col("doc_id"), lit(100L)) < lit(math.round(sampleFraction * 100)))
    var types = corpus
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .as[(String, Long)]
      .map { case (t, f) => (t, TextAnalysis.codePointSymbols(t), f) }
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rounds = 0
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      // adjacent pairs: element i pairs with i+1, one generate per type
      val counts = types.toDF("tok", "syms", "tf")
        // fully-merged single-symbol types carry no pairs — and sequence()
        // DESCENDS when start > stop, so they must not reach the generate
        .filter(size(col("syms")) >= 2)
        .select(col("tf"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("tf")).as("n"))
      // BATCHED merge selection (round-16 verdict #7): accept up to
      // `want` SYMBOL-DISJOINT pairs from one count pass — the standard
      // batched-BPE trick. Disjointness is what makes the batch exact
      // per pair: merging (a,b) only perturbs counts of pairs touching
      // a or b (it consumes those symbols and mints "ab"), so the
      // accepted pairs' counts are the same numbers sequential rounds
      // would have seen, and their applications commute. What batching
      // DOES trade away is the chance for a freshly-minted symbol to
      // out-count a later accepted pair — sequential picks it, batched
      // defers it one round (vocab parity on disjoint-pair corpora is
      // spec-proven; at batchMerges=1 the loop is byte-identical to the
      // sequential trainer, which is what every declared oracle runs).
      val want = math.min(math.max(batchMerges, 1), nMerges - merges.size)
      // over-fetch: overlapping candidates are skipped, so pull a few
      // extra rows (still a bounded, want-sized driver constant)
      val top = counts.orderBy(col("n").desc, col("l"), col("r"))
        .limit(want * 4).collect()
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        top.iterator.takeWhile(_ => accepted.size < want).foreach { row =>
          val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
          if (!used(l) && !used(r)) { accepted += ((l, r, n)); used += l; used += r }
        }
        accepted.foreach { case (l, r, n) =>
          merges += ((merges.size + 1L, l, r, n))
        }
        val batch = accepted.toSeq
        types = types.map { case (t, syms, f) =>
          (t, batch.foldLeft(syms) { case (ss, (l, r, _)) =>
            TextAnalysis.applyMerge(ss, l, r) }, f)
        }.localCheckpoint()
        rounds += 1
      }
    }
    (merges.toSeq, types, rounds)
  }

  private def trainState(s: SparkSession, dir: String, nMerges: Int,
                         sampleFraction: Double = 1.0)
      : (Seq[(Long, String, String, Long)],
         org.apache.spark.sql.Dataset[(String, Seq[String], Long)]) = {
    val (m, t, _) = trainStateWithRounds(s, dir, nMerges, sampleFraction)
    (m, t)
  }

  /** BPE ENCODE — the trained merges applied back to the corpus, the
    * step that turns a merge table into training data: per document,
    * how many whitespace tokens, how many BPE symbols they encode to
    * under the [[bpeTrain]] vocabulary, total encodable characters, and
    * chars-per-symbol (the compression the tokenizer actually buys;
    * 1.0 = no merge ever fires in that doc). The heavy lifting rides
    * the TYPE relation: the trainer's final state already holds every
    * word type's symbol sequence, so encoding the corpus is one
    * equi-join of the (doc, token) stream against the ≤|vocabulary|
    * encoded-type relation plus a per-doc aggregate — at 100 TB the
    * merge cascade runs over millions of types while the trillions of
    * occurrences only pay a hash join on the token key (broadcast-able
    * when the vocabulary is; AQE decides). Oracle: the trainer's
    * unrolled CTE chain carries the token key through the rounds, then
    * replays the identical join+aggregate. */
  def bpeEncode(s: SparkSession, dir: String, nMerges: Int = 10): DataFrame =
    encodeOver(s, dir, encodedVocab(s, dir, nMerges))

  /** [[bpeEncode]] served from the PERSISTED vocabulary table
    * ([[IndexTables.ensureBpeVocab]]) — the deployed tokenizer shape
    * (round-12 verdict #5): a real tokenizer is 30k+ merges, and the
    * merge LOOP is a train-time cost paid once; encoding any corpus
    * after that is one equi-join of the (doc, token) stream against
    * the committed (tok, n_syms) table plus the per-doc rollup. The
    * declared twin stays at nMerges = 10 (the unrolled-CTE oracle's
    * contract depth) and shares `text_bpe_encode`'s oracle text —
    * identical rows BY the shared encode body ([[encodeOver]]), with
    * BpeVocabSpec proving table-encode ≡ loop-encode at a merge count
    * the oracle could never unroll. */
  def bpeEncodeTable(s: SparkSession, dir: String, nMerges: Int = 10): DataFrame =
    encodeOver(s, dir, s.table(IndexTables.ensureBpeVocab(s, dir, nMerges)))

  /** TOKENIZER FERTILITY by source (round 14) — the standard
    * tokenizer-health read before a training run: per source,
    * whitespace words vs trained-tokenizer tokens (fertility =
    * tokens/word — the metric multilingual tokenizer evaluations
    * report per language/domain, here per source slice) and
    * chars/token (compression). A source whose fertility is an
    * outlier is paying disproportionate sequence budget for the same
    * text mass — the input to the mixture/packing decisions the
    * `pipe_*_bpe` family plans. One groupBy(source) over the per-doc
    * encode rollup ([[bpeEncode]] — the memoized vocabulary join the
    * BPE family already materializes); docs encoding to nothing keep
    * their doc slots via the left join, like every BPE denominator. */
  def bpeFertility(s: SparkSession, dir: String, nMerges: Int = 10): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), col("source"))
      .join(bpeEncode(s, dir, nMerges)
        .select(col("doc_id"), col("n_tokens").as("w"),
                col("n_symbols").as("b"), col("n_chars").as("c")),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           coalesce(sum(col("w")), lit(0L)).as("n_words"),
           coalesce(sum(col("b")), lit(0L)).as("n_bpe_tokens"),
           coalesce(sum(col("c")), lit(0L)).as("n_chars"))
      .withColumn("fertility",
        when(col("n_words") > 0,
          trunc6(col("n_bpe_tokens").cast("double") / col("n_words")))
          .otherwise(lit(0.0)))
      .withColumn("chars_per_token",
        when(col("n_bpe_tokens") > 0,
          trunc6(col("n_chars").cast("double") / col("n_bpe_tokens")))
          .otherwise(lit(0.0)))
      .orderBy(col("source"))

  /** The trained (tok, n_syms) vocabulary relation — the unit
    * [[IndexTables.ensureBpeVocab]] persists and [[bpeEncode]] joins
    * in-plan. ONE derivation off the trainer's final type state,
    * MEMOIZED per (session, dir, nMerges): eight declared queries ride
    * this vocabulary (encode, the table build, and the six
    * BPE-denominated budget twins), and each was re-running the whole
    * O(rounds) merge loop — the most driver-coordinated derivation in
    * the engine — per invocation. One tokenizer per corpus per
    * process, exactly like the shingle/signature/vector memos (the
    * persisted table, [[IndexTables.ensureBpeVocab]], remains the
    * durable/cross-process form). The relation is vocabulary-sized,
    * so pinning it is cheap at any scale. */
  private[ops] def encodedVocab(s: SparkSession, dir: String, nMerges: Int): DataFrame =
    Tables.memoized(s"bpeVocab$nMerges", s, dir) {
      val (_, types) = trainState(s, dir, nMerges)
      types.toDF("tok", "syms", "tf")
        .select(col("tok"), size(col("syms")).cast("long").as("n_syms"))
    }

  /** THE encode join+aggregate over an explicit (tok, n_syms)
    * vocabulary — one definition for the loop-trained and
    * table-served paths, so the twins cannot drift. */
  private def encodeOver(s: SparkSession, dir: String, encoded: DataFrame): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .join(encoded, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
           sum(col("n_syms")).as("n_symbols"),
           sum(length(col("tok"))).cast("long").as("n_chars"))
      .withColumn("chars_per_symbol",
        trunc6(col("n_chars").cast("double") / col("n_symbols")))
      .orderBy(col("doc_id"))

  /** A word's initial symbol sequence: one symbol per Unicode CODE
    * POINT, not per UTF-16 code unit — `String.map(_.toString)` would
    * split a supplementary-plane character (emoji, rare CJK) into two
    * lone surrogates, desyncing the trainer from the DuckDB oracle,
    * whose regexp `(.)` matches whole code points. */
  private[ops] def codePointSymbols(t: String): Seq[String] =
    t.codePoints().toArray.toSeq
      .map(cp => new String(Character.toChars(cp)))

  /** One left-to-right merge pass over a word's symbol sequence —
    * non-overlapping, greedy from the left (standard BPE apply). */
  private[ops] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Per-source term-distribution DRIFT vs the whole corpus — the
    * distribution-shift monitor a mixture pipeline runs per ingest feed
    * (a source whose unigram distribution diverges is a domain shift,
    * an encoding bug, or contamination — all things to catch BEFORE
    * training). The statistic is exact L1 distance between the source's
    * and the corpus's unigram distributions, computed WITHOUT float
    * probabilities: put both on the common denominator N_s·N_c, so each
    * present term contributes |tf_s·N_c − tf_c·N_s| (exact BIGINT) and
    * the terms ABSENT from the source contribute N_s·(N_c − Σ_present
    * tf_c) in one closed form — no join against the absent-term set,
    * no explode beyond the token pass every text op here shares. One
    * final IEEE division (trunc6) turns the integer numerator into the
    * [0,2] L1 score identically on any engine. Aggregations are keyed
    * (source, tok) then tok then source — hash-partitioned, map-side
    * combined, no broadcast of the vocabulary (the corpus term relation
    * joins on the token key). */
  def sourceDrift(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("tf_s"))
    val corpus = toks.groupBy(col("tok")).agg(sum(col("tf_s")).as("tf_c"))
    // N_c stays IN-PLAN: the 1-row corpus total rides a constant-key
    // broadcast join onto the (bounded) per-source relation — same trick
    // as Dedup.cappedShingles, so building this query dispatches no job
    val nTotalDf = corpus.agg(sum(col("tf_c")).as("n_c")).withColumn("k", lit(1))
    // per-source token mass: #sources rows — broadcast-safe at any corpus
    // size (the source dimension is bounded, unlike the vocabulary)
    val perSource = toks.groupBy(col("source")).agg(sum(col("tf_s")).as("n_s"))
      .withColumn("k", lit(1))
      .join(broadcast(nTotalDf), Seq("k"))
      .select(col("source"), col("n_s"), col("n_c"))
    // products stay < 2⁶³ while total corpus tokens < ~3·10⁹; past that,
    // route the two multiplications through DECIMAL(38,0) — same plan
    toks.join(corpus, Seq("tok"))
      .join(broadcast(perSource), Seq("source"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_s"), // constant within the group
           max(col("n_c")).as("n_c"),
           count(lit(1)).as("n_terms"),
           sum(abs(col("tf_s") * col("n_c") - col("tf_c") * col("n_s"))).as("present_num"),
           sum(col("tf_c")).as("present_tfc"))
      .withColumn("drift_num",
        col("present_num") + col("n_s") * (col("n_c") - col("present_tfc")))
      .withColumn("l1_drift",
        trunc6(col("drift_num").cast("double") / (col("n_s").cast("double") * col("n_c"))))
      .select(col("source"), col("n_s"), col("n_terms"), col("drift_num"), col("l1_drift"))
      .orderBy(col("source"))
  }

  /** Segment-level BOILERPLATE detection — the C4-style "line dedup"
    * re-expressed over fixed token segments (this corpus carries no
    * newline structure, so the dedup unit is each document's
    * consecutive 8-token window). A segment whose cross-document
    * frequency reaches `dfThreshold` is boilerplate — template headers,
    * navigation chrome, license blurbs: content that repeats VERBATIM
    * across documents that are NOT near-duplicates of each other, which
    * document-level dedup structurally keeps. Per document: segment
    * count, boilerplate-segment count, and the boilerplate ratio a
    * cleaning pass would strip. Segments are keyed by the same 60-bit
    * md5-derived integers as shingles (8-byte shuffle keys, never
    * segment text); the DF aggregate counts DISTINCT docs so a segment
    * repeated inside one document can't promote itself to boilerplate.
    * Two shuffles (segment DF, per-doc rollup) + one hash equi-join —
    * the same plan at any corpus size. */
  def boilerplate(s: SparkSession, dir: String, segTokens: Int = 8,
                  dfThreshold: Int = 2): DataFrame = {
    val segs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= segTokens) // sequence() descends when start > stop
      .select(col("doc_id"), col("source"), explode(expr(
        s"""transform(sequence(0, CAST(size(w) / $segTokens AS INT) - 1),
           |  k -> CAST(conv(substr(md5(array_join(slice(w, $segTokens * k + 1, $segTokens), ' ')), 1, 15), 16, 10) AS BIGINT))"""
          .stripMargin)).as("seg"))
    val df = segs.select(col("doc_id"), col("seg")).distinct()
      .groupBy(col("seg")).agg(count(lit(1)).as("df"))
    segs.join(df, Seq("seg"))
      .groupBy(col("doc_id"))
      .agg(max(col("source")).as("source"), // constant within the doc
           count(lit(1)).as("n_segs"),
           sum(when(col("df") >= dfThreshold, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_ratio",
        Tables.trunc6(col("n_boiler").cast("double") / col("n_segs")))
      .select(col("doc_id"), col("source"), col("n_segs"), col("n_boiler"),
              col("boiler_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model QUALITY score per document — the CCNet-style
    * "does an n-gram LM find this text plausible" gate, with the corpus
    * itself as the LM's training set: every adjacent token pair scores
    * the inverse of its conditional probability, icp = c(w1·)/c(w1w2)
    * (1 = the only continuation ever seen, large = a transition the
    * corpus almost never makes), and a document's mean/max icp separate
    * fluent text (low mean) from gibberish or shuffled spam (high mean,
    * spiky max). Deliberately INTEGER-EXACT in place of log-perplexity:
    * `ln` is not required to be correctly rounded, so two engines can
    * disagree in the last ulp and a hash-matched oracle would flake —
    * integer DIV of the two counts is monotone in surprisal, engine-
    * identical, and sums as plain BIGINTs. Counts key on 60-bit
    * md5-derived integers (8-byte shuffle keys); both count relations
    * are vocabulary-bounded, the occurrence stream pays two hash joins
    * — at 100 TB the same plan with the (tiny) count sides
    * AQE-broadcast. At extreme counts c(w1·) stays < 2⁶³ while corpus
    * tokens do, so no overflow anywhere in the integer path. */
  def lmBigram(s: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(w)-2), i -> named_struct(
          |  'k1', CAST(conv(substr(md5(w[i]), 1, 15), 16, 10) AS BIGINT),
          |  'k2', CAST(conv(substr(md5(concat(w[i], ' ', w[i+1])), 1, 15), 16, 10) AS BIGINT)))"""
          .stripMargin)).as("p"))
      .select(col("doc_id"), col("p.k1").as("k1"), col("p.k2").as("k2"))
      // three consumers (both count relations + the scoring probe) —
      // materialize the 24-byte-row occurrence stream once instead of
      // re-exploding and re-md5-ing the corpus per consumer
      .localCheckpoint()
    val c2 = occ.groupBy(col("k2")).agg(count(lit(1)).as("n2"))
    val c1 = occ.groupBy(col("k1")).agg(count(lit(1)).as("n1"))
    occ.join(c2, Seq("k2")).join(c1, Seq("k1"))
      .withColumn("icp", expr("n1 DIV n2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("icp")).as("icp_sum"),
           max(col("icp")).as("max_icp"))
      .withColumn("mean_icp",
        trunc6(col("icp_sum").cast("double") / col("n_bigrams")))
      .orderBy(col("doc_id"))
  }

  /** Duplicate n-gram OCCURRENCE rate per source — the corpus-health
    * metric (fraction of all n-gram occurrences whose n-gram appears
    * more than once corpus-wide) that large-scale curation tracks
    * round-over-round: near-dup pair detection answers "which documents
    * collide", this answers "how much of the token stream is repeated
    * content at all". Occurrence-weighted on purpose — a boilerplate
    * 8-gram pasted into a million documents should dominate the rate,
    * not count once like it would in a distinct-gram view. Grams are
    * keyed by the same 60-bit md5-derived integers as shingles (8-byte
    * shuffle keys, never gram text). Two aggregations — (gram, source)
    * occurrence counts, then per-gram totals as a sum over the ≤5
    * source rows — plus one join on the gram key that is bounded by
    * DISTINCT vocabulary, not the occurrence stream: the occurrence
    * explosion collapses at the FIRST map-side-combinable groupBy, so
    * at 100 TB the join moves vocabulary-sized relations only. */
  def ngramNovelty(s: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val perSg = Tables.documents(s, dir)
      .select(col("source"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= n) // sequence() descends when start > stop
      .select(col("source"), explode(expr(
        s"""transform(sequence(0, size(w) - $n),
           |  i -> CAST(conv(substr(md5(array_join(slice(w, i + 1, $n), ' ')), 1, 15), 16, 10) AS BIGINT))"""
          .stripMargin)).as("g"))
      .groupBy(col("g"), col("source")).agg(count(lit(1)).as("occ_sg"))
      // two consumers (the per-gram rollup + the join) — materialize the
      // vocabulary-sized (g, source, occ) relation once instead of
      // re-exploding and re-md5-ing the corpus per consumer
      .localCheckpoint()
    val global = perSg.groupBy(col("g")).agg(sum(col("occ_sg")).as("occ_g"))
    perSg.join(global, Seq("g"))
      .groupBy(col("source"))
      .agg(sum(col("occ_sg")).as("n_occurrences"),
           count(lit(1)).as("n_distinct_grams"),
           sum(when(col("occ_g") > 1, col("occ_sg")).otherwise(0L)).as("n_dup_occ"))
      .withColumn("dup_rate",
        trunc6(col("n_dup_occ").cast("double") / col("n_occurrences")))
      .orderBy(col("source"))
  }
}
