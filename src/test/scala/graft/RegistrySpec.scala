package graft

class RegistrySpec extends SparkSpec {

  test("registry names are unique and oracle keys are a subset") {
    val names = Q.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and is non-degenerate on sf0.001") {
    val failures = Q.registry.flatMap { q =>
      try {
        q.fn(spark, sf()).count(); None
      } catch { case e: Throwable => Some(s"${q.name}: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
