package graft

class SparkEntrySpec extends SparkTestBase {

  test("entry: flagship point-in-time pipeline returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    val cols = df.columns.toSet
    assert(cols.contains("conv_id") && cols.contains("matched_ts"))
  }

  test("every query has either an oracle or is explicitly rows-only") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
