package graft

/** Every declared query runs at sf0.001 and returns rows; every
  * oracle-declared query's column set is stable (the driver hashes
  * columns sorted by name — a rename breaks the gate silently).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("all declared queries execute and return rows") {
    SparkEntry.declared.foreach { q =>
      val df = q.fn(spark, sf)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }

  test("declared names are unique and oracle keys are a subset") {
    val names = SparkEntry.declared.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
