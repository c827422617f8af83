package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-1 post-mortem: the driver's CORRECTNESS artifact came back empty,
  * so this now also writes outDir/verify_summary.json (per-query ok/rows/
  * error) and exits non-zero if zero queries produced output — a silent
  * all-fail can't masquerade as "nothing to report" again.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val status = scala.collection.mutable.LinkedHashMap.empty[String, Either[String, Long]]
    // optional args beyond (sfDir, outDir): query-name substrings to run
    // (iteration aid; the driver passes none and gets the full catalog)
    val wanted = args.drop(2).toSeq
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        status(name) = Right(rows)
      } catch { case e: Throwable =>
        status(name) = Left(Option(e.getMessage).getOrElse(e.getClass.getName))
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val summary = status.map {
      case (k, Right(rows)) => s"${q(k)}: {\"ok\": true, \"rows\": $rows}"
      case (k, Left(err))   => s"${q(k)}: {\"ok\": false, \"error\": ${q(err)}}"
    }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), summary)
    val okCount = status.values.count(_.isRight)
    println(s"""{"verify":"done","out":"$outDir","queries":${status.size},"ok":$okCount}""")
    spark.stop()
    if (okCount == 0) sys.exit(1)
  }
}
