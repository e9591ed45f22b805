package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * oracle key must have a matching query. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a query; names are unique across modules") {
    val q = SparkEntry.queries
    val o = SparkEntry.oracleSql
    assert(o.keySet.subsetOf(q.keySet), s"orphan oracles: ${o.keySet -- q.keySet}")
    assert(q.nonEmpty)
  }
}
