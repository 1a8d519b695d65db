package graft

/** Driver-contract insurance: every `queries` entry runs against sf0.001
  * without throwing, every oracle key has a matching query, and the
  * flagship `entry` returns rows (the driver's smoke check).
  */
class SparkEntrySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  test("every oracle key has a query; names are consistent") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet -- qs
    assert(orphan.isEmpty, s"oracleSql keys without queries: $orphan")
  }

  test("every query executes at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, sfDir).limit(5).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
