package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.schema.SchemaReconciler._

class SchemaReconcilerSpec extends SparkSpec {

  private val src = StructType(Seq(
    StructField("a", StringType), StructField("b", IntegerType),
    StructField("c", TimestampType), StructField("srcOnly", LongType)))
  private val dst = StructType(Seq(
    StructField("c", DateType), StructField("b", LongType),
    StructField("a", StringType), StructField("dstOnly", LongType)))

  test("intersection keeps source order (reference sidefunctions.go:78-97)") {
    assert(intersect(src, dst).map(_._1.name) == Seq("a", "b", "c"))
  }

  test("cast plan bridges type mismatches") {
    val plan = castPlan(src, dst)
    assert(plan.map(_._1) == Seq("a", "b", "c"))
  }

  test("strict policy raises on unknown pair; compat drops (sidefunctions.go:153-154)") {
    val s = StructType(Seq(StructField("x", StructType(Seq(StructField("i", IntegerType))))))
    val d = StructType(Seq(StructField("x", IntegerType)))
    intercept[UnsupportedCastException](castPlan(s, d))
    assert(castPlan(s, d, CastPolicy.DropUnknown).isEmpty)
  }

  test("cast matrix arms are total over the §1.3 vocabulary") {
    val pairs = Seq(
      StringType -> IntegerType, StringType -> LongType, StringType -> DateType,
      StringType -> TimestampType, IntegerType -> StringType,
      IntegerType -> LongType, LongType -> DecimalType(38, 0),
      TimestampType -> DateType, DateType -> TimestampType,
      ArrayType(StringType) -> ArrayType(StringType),
      ArrayType(IntegerType) -> ArrayType(LongType))
    pairs.foreach { case (f, t) =>
      assert(castRule("x", f, t).nonEmpty, s"$f -> $t should have a rule")
    }
  }

  test("wide-int arms: UInt64→Decimal(20,0) exact above 2^63; Int128/256→Decimal(38,0) lossy edge") {
    import spark.implicits._
    // UInt64 max (2^64-1) arrives as text from a staging source; the
    // Decimal(20,0) target must round-trip it exactly — LongType cannot.
    val uint64Max = "18446744073709551615"
    val c1 = castRule("x", StringType, UInt64Type)
    assert(c1.nonEmpty)
    val got = Seq(uint64Max).toDF("x").select(c1.get.as("x")).head().getDecimal(0)
    assert(got == new java.math.BigDecimal(uint64Max))
    // Int128 values inside 38 digits round-trip through Decimal(38,0)
    val in128 = "99999999999999999999999999999999999999" // 38 nines
    val c2 = castRule("x", StringType, WideIntType)
    val got2 = Seq(in128).toDF("x").select(c2.get.as("x")).head().getDecimal(0)
    assert(got2 == new java.math.BigDecimal(in128))
    // beyond 38 digits (possible in Int256) the cast cannot represent the
    // value — documented lossiness: ANSI raises, so the divergence is loud
    val over = "1" + "0" * 38 // 39 digits
    intercept[Exception] {
      Seq(over).toDF("x").select(c2.get.as("x")).collect()
    }
    // generic numeric arm reaches the same targets from integer sources
    assert(castRule("x", LongType, UInt64Type).nonEmpty)
    assert(castRule("x", LongType, WideIntType).nonEmpty)
  }

  test("cast plan executes: string staging table to typed (FIXTURES.md B5)") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet").limit(100)
    val staged = li.select(li.columns.map(c => col(c).cast("string").as(c)): _*)
    val plan = castPlan(staged.schema, li.schema)
    val restored = staged.select(plan.map(_._2): _*)
    assert(restored.schema.fields.map(_.dataType).toSeq ==
      li.schema.fields.map(_.dataType).toSeq)
    // content round-trips (fingerprint equality)
    val fpA = graft.fp.Fingerprint.ofDataFrame(li)
    val fpB = graft.fp.Fingerprint.ofDataFrame(restored)
    assert(fpA == fpB)
  }
}
