package graft

/** Driver-contract smoke: entry() runs the flagship ACON pipeline. */
class EntrySpec extends SparkSpec {
  test("entry returns a non-empty pricing summary through the engine") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("sum_disc_price"))
  }

  test("every catalog query has unique name; oracles reference known tables") {
    val names = graft.queries.QueryCatalog.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }
}
