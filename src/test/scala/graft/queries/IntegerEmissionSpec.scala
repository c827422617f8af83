package graft.queries

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.core.Tables

/** Guard for the round-3 gate migration that replaced DECIMAL output
  * columns with BIGINT scaled units (×100 / ×10000 "cents"): the integer
  * emissions must equal the decimal formulations they replaced EXACTLY —
  * a silent semantics change under the dtype switch would pass the driver
  * hash while answering a different question. One property per migrated
  * family (scale-2 sums, scale-4 product sums, windowed running sums) on
  * generated data, plus fixture checks on the grouped shapes. */
class IntegerEmissionSpec extends SparkSpec {
  import spark.implicits._

  private def samples(n: Int, seed0: Int): Seq[List[Double]] =
    (1 to n).flatMap(i => Gen.listOfN(60, Gen.chooseNum(-1e6, 1e6))
      .apply(Gen.Parameters.default, Seed((seed0 + i).toLong)))
      .filter(_.nonEmpty)

  test("property: scale-2 decimal sum ×100 as BIGINT is exact (incl. negatives)") {
    samples(12, 0).zipWithIndex.foreach { case (xs, i) =>
      val r = xs.toDF("x").agg(
        expr("sum(CAST(x AS DECIMAL(18,2)))").as("dec"),
        expr("CAST(sum(CAST(x AS DECIMAL(18,2))) * 100 AS BIGINT)").as("cents")).head()
      assert(BigDecimal(r.getLong(1)) == BigDecimal(r.getDecimal(0)) * 100,
        s"sample $i")
    }
  }

  test("property: scale-4 product sum ×10000 as BIGINT is exact") {
    samples(12, 100).zipWithIndex.foreach { case (xs, i) =>
      val df = xs.map(x => (x, math.abs(x % 1.0))).toDF("p", "d")
      val r = df.agg(
        expr("sum(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2))))").as("dec"),
        expr("CAST(sum(CAST(p AS DECIMAL(18,2)) * (1 - CAST(d AS DECIMAL(18,2)))) * 10000 AS BIGINT)").as("u")).head()
      assert(BigDecimal(r.getLong(1)) == BigDecimal(r.getDecimal(0)) * 10000,
        s"sample $i")
    }
  }

  test("fixture: grouped cent sums equal decimal sums ×100 (q08/q15/q19/q25/q28/q55/q71 family)") {
    val r = Tables.load(spark, sf001, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").agg(
        expr("sum(CAST(l_quantity AS DECIMAL(18,2)))").as("dq"),
        expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)").as("iq"),
        expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)))").as("dp"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("ip"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(BigDecimal(row.getAs[Long]("iq")) ==
        BigDecimal(row.getAs[java.math.BigDecimal]("dq")) * 100)
      assert(BigDecimal(row.getAs[Long]("ip")) ==
        BigDecimal(row.getAs[java.math.BigDecimal]("dp")) * 100)
    }
  }

  test("fixture: scale-4 revenue ×10000 equals the decimal revenue (q15 sum_disc / q16 family)") {
    val r = Tables.load(spark, sf001, "lineitem")
      .groupBy("l_returnflag").agg(
        expr("sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))))").as("d"),
        expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)").as("i"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(BigDecimal(row.getAs[Long]("i")) ==
        BigDecimal(row.getAs[java.math.BigDecimal]("d")) * 10000)
    }
  }

  test("fixture: every windowed running total ×100 equals its decimal window sum (q47 family)") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val rows = Tables.load(spark, sf001, "orders")
      .select(
        sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w).as("dec"),
        (sum(expr("CAST(o_totalprice AS DECIMAL(18,2))")).over(w) * 100)
          .cast("bigint").as("cents"))
      .collect()
    assert(rows.nonEmpty)
    // compare against DRIVER-side exact arithmetic, not a re-run of the
    // same Spark expression — that would be vacuously true
    rows.foreach { r =>
      assert(BigDecimal(r.getLong(1)) == BigDecimal(r.getDecimal(0)) * 100)
    }
  }
}
