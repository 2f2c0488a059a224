package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query must carry an oracle
  * (the hash-match gate) unless it is on the documented exception list
  * of sketch-based operators whose values can't be replayed in SQL. */
class SparkEntrySpec extends AnyFunSuite {

  // HLL + KLL-style quantile sketch — rows-only checks; the quantile
  // twin's error is bounded against its exact twin in TextAnalysisSpec
  // + bloom-sketch decontamination twin (bit layout is engine-specific;
  // its no-false-negatives contract vs the exact twin is in PipelineSpec).
  // (The BPE trainer left this list in round 5: its oracle unrolls the
  // merge rounds as CTE chains — see SparkEntry.bpeTrainOracle.)
  private val sketchOnly = Set("q21_approx_distinct", "text_length_quantiles_approx",
    "pipe_decontaminate_bloom")

  test("every query has oracle SQL, except documented sketch-based ops") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === sketchOnly,
      s"queries without an oracle (weaker check): ${missing -- sketchOnly}")
  }

  test("no orphaned oracle entries (oracle without a query is dead weight)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans === Set.empty[String])
  }

  test("oracle SQL has no TODO/placeholder text") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("???") && !sql.toLowerCase.contains("todo"), name)
    }
  }
}
