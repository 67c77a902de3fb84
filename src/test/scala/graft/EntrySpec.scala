package graft

/** Covers the driver's t1 smoke contract: entry() on sf0.001 returns rows, and
  * every oracleSql key has a queries entry (a dangling oracle would make the
  * driver's compare read a missing result directory). */
class EntrySpec extends SparkSpec {

  test("entry flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; keys are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracles without queries: ${os -- qs}")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty))
  }
}
