package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query must carry an oracle
  * (the hash-match gate) unless it is on the documented exception list
  * of sketch-based operators whose values can't be replayed in SQL. */
class SparkEntrySpec extends AnyFunSuite {

  // Since round 7 the sketch twins (HLL, approx-quantile, bloom) emit
  // their error-bound contract in oracle-checkable form (exact value +
  // bound-holds flag), so EVERY declared query carries an oracle and
  // the driver's hash gate has zero rows-only entries.
  test("every query has oracle SQL — no rows-only entries left") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === Set.empty[String],
      s"queries without an oracle (weaker check): $missing")
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
