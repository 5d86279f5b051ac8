package graft

/** Driver-contract invariants: every oracle key has a query, the flagship
  * entry returns rows, and catalog names are well-formed. */
class CatalogContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("catalog is non-trivial and names are unique/well-formed") {
    assert(SparkEntry.queries.size >= 60)
    assert(SparkEntry.queries.keys.forall(_.matches("q_[a-z0-9_]+")))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }
}
