package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Additional file formats behind the same read surface as parquet. CSV and
  * JSON are interchange formats (schema carried explicitly — inference is a
  * full extra scan at 100 TB, so [[readCsv]]/[[readJson]] require one);
  * parquet remains the performance format (columnar pruning + pushdown).
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** A quarantining read's two output streams plus the shared cached
    * source. [[release]] MUST be called once both outputs are consumed —
    * the cache backs the corrupt-column split (a Spark requirement since
    * 2.3) and would otherwise pin the parsed input in the block manager
    * for the session's lifetime. */
  final case class QuarantinedRead(clean: DataFrame, quarantine: DataFrame,
      private val source: DataFrame) {
    def release(): Unit = source.unpersist()
  }

  /** Quarantining JSON read: malformed lines are neither dropped silently
    * (PERMISSIVE's default nulls) nor allowed to kill a 100 TB ingest
    * (FAILFAST); they land in a `_corrupt` column so the caller can split
    * the stream — clean rows onward, quarantine rows to a side sink with
    * the raw line preserved for replay. At scale, silent row loss in
    * ingest is unauditable; a fatal job for one bad line is unoperable;
    * this is the standard third way. Call `release()` when done. */
  def readJsonQuarantine(spark: SparkSession, path: String,
      schema: StructType): QuarantinedRead = {
    import org.apache.spark.sql.functions.col
    val withCorrupt = spark.read
      .schema(schema.add("_corrupt", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      // PERMISSIVE corrupt-column access requires a materialisation
      // boundary since Spark 2.3 (the parser fills it lazily)
      .cache()
    QuarantinedRead(
      clean = withCorrupt.filter(col("_corrupt").isNull).drop("_corrupt"),
      quarantine = withCorrupt.filter(col("_corrupt").isNotNull)
        .select(col("_corrupt").as("raw_line")),
      source = withCorrupt)
  }
}
