package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ClickHouseJdbc._

/** LIVE JDBC round trip for the [[ClickHouseJdbc]] plumbing, against
  * embedded Derby (the one JDBC engine on the unmanaged Spark classpath —
  * no ClickHouse server exists in this environment). This executes, not
  * just parses: `append` creates and populates a real table through
  * Spark's JDBC sink, `read`/`readRangePartitioned`/`readPartitioned`
  * issue real driver queries, and the pushdown test asserts the filter
  * reaches the remote query via the plan's PushedFilters. In-memory
  * Derby is JVM-local, which matches local[n]: every executor thread
  * shares the embedded engine. */
class ClickHouseJdbcLiveSpec extends SparkSpec {
  import spark.implicits._

  // one in-memory database for the suite; APP is Derby's default schema
  private val url = "jdbc:derby:memory:graftlive;create=true"
  private def conn(table: String) = Conn(
    database = "APP", table = table,
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    urlOverride = Some(url))

  // UPPERCASE column names: Spark's JDBC sink quotes identifiers, and
  // Derby folds unquoted query identifiers (range/predicate WHERE columns)
  // to uppercase — lowercase quoted columns would be unreachable from the
  // unquoted predicate strings a caller passes.
  private lazy val fixture = {
    val df = (1L to 100L).map(i => (i, s"name$i", i % 7)).toDF("ID", "NAME", "GRP")
    ClickHouseJdbc.append(df, conn("T_ROUNDTRIP"))
    df
  }

  test("append creates the table and read round-trips every row") {
    assert(fixture.count() == 100) // force the append first
    val back = ClickHouseJdbc.read(spark, conn("T_ROUNDTRIP"))
    assert(back.count() == 100)
    assert(back.select("id", "name", "grp").as[(Long, String, Long)].collect().toSet ==
      fixture.as[(Long, String, Long)].collect().toSet)
  }

  test("append is append (not replace): second write doubles the rows") {
    fixture.count() // ensure table exists
    val c = conn("T_APPEND2")
    ClickHouseJdbc.append((1L to 10L).toDF("id"), c)
    ClickHouseJdbc.append((11L to 20L).toDF("id"), c)
    val back = ClickHouseJdbc.read(spark, c)
    assert(back.as[Long].collect().sorted.toSeq == (1L to 20L))
  }

  test("readRangePartitioned splits the scan into parallel range queries") {
    fixture.count()
    val df = ClickHouseJdbc.readRangePartitioned(
      spark, conn("T_ROUNDTRIP"), "ID", lower = 1, upper = 101, numPartitions = 4)
    assert(df.rdd.getNumPartitions == 4)
    // no row lost or duplicated across the range splits
    assert(df.agg(count(lit(1)), sum("id")).as[(Long, Long)].head() ==
      ((100L, (1L to 100L).sum)))
  }

  test("readPartitioned issues one executor query per predicate (GenerateWhere scoping)") {
    fixture.count()
    val df = ClickHouseJdbc.readPartitioned(spark, conn("T_ROUNDTRIP"),
      Seq("ID <= 50", "ID > 50"))
    assert(df.rdd.getNumPartitions == 2)
    assert(df.count() == 100)
    // disjoint predicates partition the table exactly
    assert(df.select("id").as[Long].collect().sorted.toSeq == (1L to 100L))
  }

  test("END-TO-END live reconcile: verify -> repair -> re-verify between two JDBC tables") {
    import graft.recon.Reconciler
    fixture.count()
    // src: 60 rows over 3 partitions (GRP 0/1/2); dst: partition 2 missing,
    // one row of partition 1 corrupted — the reference's repair scenario
    val src = (1L to 60L).map(i => (i, s"v$i", i % 3)).toDF("ID", "VAL", "GRP")
    ClickHouseJdbc.append(src, conn("T_RECON_SRC"))
    val dstRows = src.filter(col("GRP") =!= 2)
      .withColumn("VAL", when(col("ID") === 4, "corrupted").otherwise(col("VAL")))
    ClickHouseJdbc.append(dstRows, conn("T_RECON_DST"))

    def side(table: String) = ClickHouseJdbc.read(spark, conn(table))
    val contentCols = Seq(col("ID"), col("VAL"), col("GRP"))
    def verdicts() = Reconciler.verdicts(
      side("T_RECON_SRC"), side("T_RECON_DST"),
      Seq("GRP" -> col("GRP")), contentCols, contentCols)
    val v1 = verdicts().collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(v1 == Map(0L -> "skip", 1L -> "delete_recopy", 2L -> "copy"))

    // repair the REMOTE destination: driver-side partition DELETE + one
    // distributed JDBC append of the affected partitions
    val acted = Reconciler.repairJdbc(spark, verdicts(),
      side("T_RECON_SRC"), "GRP", conn("T_RECON_DST"))
    assert(acted.map(_.asInstanceOf[Long]).toSet == Set(1L, 2L))

    // post-repair: every partition verifies clean, content round-tripped
    val v2 = verdicts().collect().map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(v2 == Map(0L -> "skip", 1L -> "skip", 2L -> "skip"))
    assert(side("T_RECON_DST").as[(Long, String, Long)].collect().toSet ==
      src.as[(Long, String, Long)].collect().toSet)
  }

  test("Catalyst pushes filters into the remote JDBC query (PushedFilters)") {
    fixture.count()
    val filtered = ClickHouseJdbc.read(spark, conn("T_ROUNDTRIP"))
      .filter(col("id") > 90).select("id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"),
      s"expected a pushed GreaterThan filter in:\n$plan")
    assert(filtered.as[Long].collect().sorted.toSeq == (91L to 100L))
  }
}
