package graft.functions.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorAggregatesSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("vectorSum == posexplode+groupBy formulation on the embeddings fixture") {
    import spark.implicits._
    val quant = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val fast = emb.select(col("label"), quant.as("q"))
      .groupBy("label").agg(VectorAggregates.vectorSum(col("q")).as("s"))
      .select(col("label"), posexplode(col("s")).as(Seq("i", "v")))
    val ref = emb.select(col("label"), posexplode(quant).as(Seq("i", "v")))
      .groupBy("label", "i").agg(sum("v").as("v"))
    val diff = fast.as("f").join(ref.as("r"), Seq("label", "i"), "full_outer")
      .filter($"f.v".isNull || $"r.v".isNull || $"f.v" =!= $"r.v")
    assert(diff.count() == 0)
  }

  test("ragged vectors zero-pad, null rows skip, null elements add 0, empty group -> null") {
    import spark.implicits._
    val df = Seq(
      (1, Seq[Option[Long]](Some(1L), Some(2L))),
      (1, Seq[Option[Long]](Some(10L), None, Some(30L))),
      (2, Seq.empty[Option[Long]])
    ).toDF("g", "v")
      .unionByName(Seq(3).toDF("g")
        .select(col("g"), lit(null).cast("array<bigint>").as("v")))
    val out = df.groupBy("g").agg(VectorAggregates.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out(1).get == Seq(11L, 2L, 30L)) // grown to 3, null element = 0
    assert(out(2).isEmpty && out(3).isEmpty) // no usable input -> null
  }

  test("overflow is loud, not a silent wraparound") {
    import spark.implicits._
    val df = Seq(Seq(Long.MaxValue), Seq(1L)).toDF("v")
    val e = intercept[Exception] {
      df.agg(VectorAggregates.vectorSum(col("v"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.isInstanceOf[ArithmeticException]))
  }

  test("partial aggregation: ObjectHashAggregate, no window, no explode") {
    val quant = transform(col("embedding"),
      x => round(x.cast("double") * 1000).cast("long"))
    val plan = emb.select(col("label"), quant.as("q"))
      .groupBy("label").agg(VectorAggregates.vectorSum(col("q")).as("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(1200))
    assert(!plan.contains("Generate") && !plan.contains("Window"), plan.take(1200))
  }
}
