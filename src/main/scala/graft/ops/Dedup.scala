package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the core
  * training-data-pipeline surface (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash). Every stage is a declarative DataFrame plan:
  *
  *  - Shingling/explosion happens ONCE into a (doc_id, shingle) relation
  *    that later joins reuse — at 100 TB this relation is the thing you
  *    partition (by shingle hash) so candidate generation is a co-located
  *    shuffle join, never a cross join.
  *  - Hashes are md5-hex (codegen'd built-in on both Spark and DuckDB),
  *    so the oracle can replay the exact same signatures.
  */
object Dedup {

  /** Truncate to 6 decimals: floor(x*1e6)/1e6. Unlike round(), this is
    * bit-identical across engines for the same double input (half-way
    * rounding modes differ between Spark and DuckDB). */
  private def trunc6(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 1000000.0) / 1000000.0

  /** (doc_id, s): distinct 3-word shingles per document. */
  private[ops] def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(w)-3), i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))")).as("s"))
      .distinct()

  /** Exact dedup summary per source: how many docs survive dedup by
    * raw text and by normalized (lower/trim) text. groupBy text is the
    * exact-dedup shuffle; counts are order-independent. */
  def exactSummary(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(col("text")).as("n_unique_texts"),
           countDistinct(lower(trim(col("text")))).as("n_unique_norm"),
           (count(lit(1)) - countDistinct(col("text"))).as("n_exact_dups"))
      .orderBy(col("source"))

  /** Exact dedup keeper set: for every duplicated text, the minimum
    * doc_id wins; emits one row per *removed* duplicate group. */
  def exactKeepers(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  /** All-pairs n-gram Jaccard near-dup: candidate pairs come from a
    * shuffle join on the shingle relation (docs sharing ≥1 shingle),
    * so cost is proportional to real overlap, not n². */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sizes.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("jaccard",
        trunc6(col("c").cast("double") / (col("x.n") + col("y.n") - col("c"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val K = 6 // minhash functions; banded 2-per-band → 3 bands

  /** MinHash signatures: k=6 hash functions simulated as
    * min(md5(seed || '|' || shingle)) — portable to the oracle. */
  private[ops] def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val aggs = (0 until K).map(i => min(md5(concat(lit(s"$i|"), col("s")))).as(s"mh$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash+LSH near-dup: band the signature (3 bands × 2 rows),
    * bucket-join per band for candidates, union+distinct, then verify
    * candidates with true Jaccard ≥ 0.5. At scale each band join is a
    * hash-partitioned equi-join on the band key — no cross join. */
  def minhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(s, dir)
      .withColumn("b0", concat(col("mh0"), col("mh1")))
      .withColumn("b1", concat(col("mh2"), col("mh3")))
      .withColumn("b2", concat(col("mh4"), col("mh5")))
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"))
      .cache()
    val cand = (0 until 3).map { b =>
      sig.as("a").join(sig.as("b"),
          col(s"a.b$b") === col(s"b.b$b") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    }.reduce(_ unionAll _).distinct()

    val sh = shingles(s, dir).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val common = cand
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id") && col("x.s") === col("y.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.as("sx"), col("doc_a") === col("sx.doc_id"))
      .join(sizes.as("sy"), col("doc_b") === col("sy.doc_id"))
      .withColumn("jaccard",
        trunc6(col("c").cast("double") / (col("sx.n") + col("sy.n") - col("c"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 16-bit SimHash per document, frequency-weighted over tokens.
    * The per-token bit vector is computed once on the (tiny) distinct
    * vocabulary and broadcast back — the heavy relation only carries
    * (doc_id, token, cnt). Bits come from the first 4 hex chars of
    * md5(token), so the oracle derives identical hashes. */
  def simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
    val vocabBits = toks.select(col("tok")).distinct()
      .withColumn("h", md5(col("tok")))
      .select(col("tok"), explode(expr(
        """transform(sequence(0, 15), j -> named_struct(
          |  'j', j,
          |  'bit', ((instr('0123456789abcdef', substr(h, CAST(FLOOR(j/4) AS INT)+1, 1)) - 1)
          |          >> (3 - (j % 4))) & 1))""".stripMargin)).as("jb"))
      .select(col("tok"), col("jb.j").as("j"), col("jb.bit").as("bit"))
    toks.join(broadcast(vocabBits), "tok")
      .groupBy(col("doc_id"), col("j"))
      .agg(sum((col("bit") * 2 - 1) * col("cnt")).as("w"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("w") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))")).otherwise(0L)).as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** SimHash bucket view: identical-simhash groups are near-dup
    * candidate clusters. */
  def simhashBuckets(s: SparkSession, dir: String): DataFrame =
    simhash(s, dir)
      .groupBy(col("simhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
      .orderBy(col("simhash"))
}
