package graft

/** Driver-contract invariants: every oracle key has a query, the flagship
  * entry returns rows, and catalog names are well-formed. */
class CatalogContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("no module silently shadows another's query name (Map ++ overwrites)") {
    val perModule = SparkEntry.modules.flatMap(_._1.keys)
    val dups = perModule.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"query name defined in multiple modules: $dups")
    val oraclesPerModule = SparkEntry.modules.flatMap(_._2.keys)
    val oDups = oraclesPerModule.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(oDups.isEmpty, s"oracle defined in multiple modules: $oDups")
  }

  test("catalog is non-trivial and names are unique/well-formed") {
    assert(SparkEntry.queries.size >= 60)
    assert(SparkEntry.queries.keys.forall(_.matches("q_[a-z0-9_]+")))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).limit(5).count() > 0)
  }
}
