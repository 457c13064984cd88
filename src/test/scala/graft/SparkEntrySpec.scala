package graft

/** Driver-contract guard: `SparkEntry.entry` is the first thing the round
  * driver runs (smoke-checks rows > 0), and since round 8 it also runs the
  * full schema smoke gate — so a regression here silently costs the round.
  * Also pins the registry invariants the driver's compare relies on:
  * every oracle name has a query, and names are unique.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry runs the smoke gate and returns rows at sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("registry invariants: oracle keys ⊆ query keys, no duplicate names") {
    val qNames = SparkEntry.allDefs.map(_.name)
    assert(qNames.distinct.size == qNames.size,
      s"duplicate query names: ${qNames.diff(qNames.distinct).distinct}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }
}
