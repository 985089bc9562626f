package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every declared query has an oracle and
  * vice versa (a key mismatch would silently weaken the correctness gate
  * to a rows-only check). */
class ContractSpec extends AnyFunSuite {
  test("queries and oracleSql keys match exactly") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names follow the gate naming convention") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: $bad")
  }
}
