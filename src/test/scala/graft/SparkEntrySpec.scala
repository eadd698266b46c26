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

  test("q41 semi/anti partitions the left side exactly (no amplification)") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q41_semi_anti")(spark, dir)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    // semi + anti = a partition of customer: every custkey exactly once,
    // regardless of how many qualifying orders a customer has
    assert(out.count() == nCust)
    assert(out.select("c_custkey").distinct().count() == nCust)
    assert(out.groupBy("tag").count().count() == 2) // both sides non-trivial
  }

  test("all queries run on sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
