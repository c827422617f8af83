package graft.fp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** The oracle-portable (md5-derived) fingerprint family: algebraic
  * properties mirroring FingerprintSpec's xxhash coverage, plus a
  * reference-implementation check that the Spark conv/substring pipeline
  * really parses the first 15 md5 hex chars (the DuckDB mirror parses the
  * same prefix — if either side drifted, the gate queries q21/q22 would
  * fail, but this pins the failure to the exact operator). */
class PortableFingerprintSpec extends SparkSpec {
  import spark.implicits._

  private def fpOf(xs: Seq[(Long, String)]): Long = {
    val df = xs.toDF("a", "b")
    val canon = Fingerprint.portableCanonicalCols(df, Seq("a", "b"))
    df.agg(Fingerprint.portableAgg(canon)).head().getLong(0)
  }

  test("portable fingerprint is order-independent and content-sensitive") {
    val xs = (1L to 40L).map(i => (i, s"row$i"))
    assert(fpOf(xs) == fpOf(scala.util.Random.shuffle(xs)))
    assert(fpOf(xs) != fpOf(xs.updated(3, (4L, "row4x"))))
    assert(fpOf(Nil) == 0L) // empty relation -> coalesced 0, like the oracle
  }

  test("portable canonical distinguishes null from empty string") {
    val a = Seq((1L, null.asInstanceOf[String])).toDF("a", "b")
    val b = Seq((1L, "")).toDF("a", "b")
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.agg(Fingerprint.portableAgg(
        Fingerprint.portableCanonicalCols(df, Seq("a", "b")))).head().getLong(0)
    assert(fp(a) != fp(b))
  }

  test("portableRowHash equals a JVM reference md5-prefix computation") {
    val df = Seq(("alpha", 42L), ("", -7L)).toDF("s", "n")
    val got = df.select(Fingerprint.portableRowHash(
        Seq(col("s"), col("n").cast(StringType)))).as[Long].collect()
    val exp = Seq(("alpha", 42L), ("", -7L)).map { case (s, n) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s\u0001$n".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    assert(got.toSeq == exp)
  }

  test("timestamp canonicalization: NTZ and instant forms agree on epoch micros under UTC") {
    // the fixture's parquet timestamps load as TimestampNTZ — the NTZ arm
    // must produce the same canonical as the instant arm under the pinned
    // UTC session, and both must equal the JVM epoch computation
    val df = Seq("1995-01-02 03:04:05").toDF("s")
      .select(col("s").cast("timestamp_ntz").as("ntz"),
        col("s").cast("timestamp").as("tz"))
    val r = df.select(
      Fingerprint.portableCanonical(col("ntz"), TimestampNTZType),
      Fingerprint.portableCanonical(col("tz"), TimestampType)).head()
    val expected = (java.time.Instant.parse("1995-01-02T03:04:05Z")
      .toEpochMilli * 1000L).toString
    assert(r.getString(0) == expected)
    assert(r.getString(1) == expected)
  }

  test("double canonicalization renders via DECIMAL(38,6) with full scale") {
    val got = Seq(1.5, -0.25, 3.0).toDF("x")
      .select(Fingerprint.portableCanonical(col("x"), DoubleType))
      .as[String].collect().toSeq
    assert(got == Seq("1.500000", "-0.250000", "3.000000"))
  }

  test("byPartitionPortable: counts match byPartition, fingerprints track content") {
    val li = graft.core.Tables.load(spark, sf001, "lineitem")
    val keys = Seq("part" -> date_format(col("l_shipdate"), "yyyyMM"))
    val prod = Fingerprint.byPartition(li, keys, li.columns.toSeq.map(col))
      .select(col("part"), col("rows")).orderBy("part").collect().toSeq
    val port = Fingerprint.byPartitionPortable(li, keys, li.columns.toSeq)
      .select(col("part"), col("n_rows")).orderBy("part").collect().toSeq
    assert(prod.map(r => (r.getString(0), r.getLong(1))) ==
      port.map(r => (r.getString(0), r.getLong(1))))
    // a perturbed relation flips the portable fingerprint of the touched
    // partition only
    val base = Fingerprint.byPartitionPortable(li, keys, li.columns.toSeq)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val pert = li.withColumn("l_quantity",
      when(date_format(col("l_shipdate"), "yyyyMM") === "199603" &&
        col("l_linenumber") === 1, col("l_quantity") + 1)
        .otherwise(col("l_quantity")))
    val after = Fingerprint.byPartitionPortable(pert, keys, li.columns.toSeq)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(base("199603") != after("199603"))
    assert((base - "199603") == (after - "199603"))
  }
}
