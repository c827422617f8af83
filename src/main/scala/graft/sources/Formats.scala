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
}
