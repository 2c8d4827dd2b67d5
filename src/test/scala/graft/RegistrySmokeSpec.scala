package graft

/** Registry-wide guard: every declared query must produce rows at the
  * smallest fixture — an empty frame would still hash-match an empty
  * oracle, silently proving nothing.
  */
class RegistrySmokeSpec extends SparkSpec {

  test("every registered query returns rows at sf0.001") {
    val empty = SparkEntry.registry.keys.toSeq.sorted.filter { name =>
      try SparkEntry.registry(name).build(spark, sf()).limit(1).count() == 0
      finally Caches.release()
    }
    assert(empty.isEmpty, s"queries with no rows at sf0.001: $empty")
  }

  test("every oracle key has a matching query and column-name discipline") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracle entries without a query: $orphan")
    // spot the classic failure mode: unaliased aggregate columns
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.toLowerCase.contains("count(*)\n") || sql.toLowerCase.contains(" as "),
        s"$name: aggregates must be aliased for the column-name hash compare")
    }
  }
}
