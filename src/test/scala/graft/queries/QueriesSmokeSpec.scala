package graft.queries

import graft.SparkSpec

/** Every catalog query must RUN end-to-end (materialised through the noop
  * sink) at sf0.001 — the in-suite miniature of the driver's Verify pass,
  * so a runtime breakage (analysis error, missing column, broken stream
  * harness) surfaces in `sbt test` instead of in the round gate. Value
  * correctness is the DuckDB gate's job; this asserts executability and
  * the flagship's non-empty contract. */
class QueriesSmokeSpec extends SparkSpec {

  test("flagship entry() returns rows at sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every SparkEntry query executes at sf0.001") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sf001).write.format("noop").mode("overwrite").save()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString}")
        }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }

  test("every query has an oracle (round 4: the catalog is 100% oracle-covered)") {
    val missing = graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracle coverage: $missing")
    // and no orphan oracles for queries that do not exist
    val orphans = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
