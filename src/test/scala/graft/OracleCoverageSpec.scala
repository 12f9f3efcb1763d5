package graft

import org.scalatest.funsuite.AnyFunSuite

/** Meta-gate over the correctness contract: every `SparkEntry.queries`
  * key either has a DuckDB oracle in `oracleSql`, or appears in
  * `noOracleEvidence` with a green twin / pinning spec — so the
  * oracle-free tail is self-auditing and a future key cannot land
  * twinless. Pure map arithmetic, no SparkSession needed.
  */
class OracleCoverageSpec extends AnyFunSuite {

  test("every query key has an oracle or a declared evidence chain") {
    val qKeys = SparkEntry.queries.keySet
    val oKeys = SparkEntry.oracleSql.keySet
    val orphans = qKeys -- oKeys -- SparkEntry.noOracleEvidence.keySet
    assert(orphans.isEmpty,
      s"oracle-free queries with no declared evidence: ${orphans.toSeq.sorted}")
  }

  test("noOracleEvidence is not stale: keys exist and lack oracles") {
    val qKeys = SparkEntry.queries.keySet
    val oKeys = SparkEntry.oracleSql.keySet
    SparkEntry.noOracleEvidence.foreach { case (k, _) =>
      assert(qKeys.contains(k), s"evidence entry for unknown query key $k")
      assert(!oKeys.contains(k),
        s"$k now has an oracle — drop its noOracleEvidence entry")
    }
  }

  test("every declared twin is itself oracle-backed") {
    val oKeys = SparkEntry.oracleSql.keySet
    val qKeys = SparkEntry.queries.keySet
    SparkEntry.noOracleEvidence.foreach { case (k, (twin, spec)) =>
      twin.foreach { t =>
        assert(qKeys.contains(t), s"$k names unknown twin $t")
        assert(oKeys.contains(t), s"$k's twin $t has no oracle — the chain is broken")
      }
      assert(spec.nonEmpty)
    }
  }

  test("every oracle key has a query (no dangling oracle SQL)") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL with no query: ${dangling.toSeq.sorted}")
  }
}
