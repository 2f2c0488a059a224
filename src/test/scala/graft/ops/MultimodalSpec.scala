package graft.ops

import graft.SparkSuite

/** Constructed-corpus guards for the multimodal operators — the checks
  * the hash-match oracle can't make. The perceptual-hash test drives
  * the 1-3 Hamming band that the synthetic corpus never produces (its
  * near-dups are byte-identical at 64-sample resolution, so every
  * corpus pair scores dist 0). */
class MultimodalSpec extends SparkSuite {

  test("phash near-dup: a one-pixel edit scores dist 1, unrelated images don't pair") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_phash").toFile
    try {
      val s = spark
      import s.implicits._
      // 64-byte payloads → stride 1, so the 64 aHash samples ARE the
      // bytes. Half 'a' (97), half 'z' (122): mean ≈ 109.5, so exactly
      // the 'z' positions set their bits.
      val base = "a" * 32 + "z" * 32
      // one sample flipped a→z: its own bit flips; the mean moves by
      // 25/64 — not enough to flip any other sample's comparison
      val oneFlip = "a" * 31 + "z" * 33
      // inverted pattern: every bit differs → far beyond maxDist
      val far = "z" * 32 + "a" * 32
      Seq((1L, base, "en", "srcP", 64L), (2L, oneFlip, "en", "srcP", 64L),
          (3L, far, "en", "srcP", 64L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Multimodal.phashNearDup(spark, tmp.toString).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq === Seq((1L, 2L, 1L)),
        s"expected exactly the one-flip pair at dist 1, got ${got.toSeq}")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("frame dedup: a shared frame counts only across documents, not within") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_frames").toFile
    try {
      val s = spark
      import s.implicits._
      val frame = "0123456789abcdef" // one 16-byte frame
      val other = "FEDCBA9876543210"
      // doc 1 loops the same frame 3×: must NOT self-promote to dup.
      // docs 2 and 3 share `frame` once each: both report it duplicated.
      Seq((1L, frame * 3, "en", "srcF", 48L),
          (2L, frame + other, "en", "srcF", 32L),
          (3L, frame + other.toLowerCase, "en", "srcF", 32L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Multimodal.frameDedup(spark, tmp.toString).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // all three docs hold `frame`, so df ≥ 2 marks it everywhere; the
      // invariant under test is the WITHIN-doc loop: doc 1's three
      // copies count as duplicated because OTHER docs hold the frame,
      // but `other` (docs 2/3 only, different case = different bytes)
      // must not be marked in either
      assert(got(1L) === (3L, 3L), s"loop doc: $got")
      assert(got(2L) === (2L, 1L) && got(3L) === (2L, 1L), s"sharing docs: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }
}
