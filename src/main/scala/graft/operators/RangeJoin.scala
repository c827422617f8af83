package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join, bucketed.
  *
  * Vanilla Spark plans `l.pt BETWEEN r.lo AND r.hi` as a broadcast
  * nested-loop join — O(|L|·|R|) comparisons, hopeless at scale. The
  * standard fix, composed from built-ins: quantise time into buckets,
  * replicate each interval into the buckets it covers (intervals are short
  * relative to the bucket width, so the blow-up is ~(span/width)+1), then
  * EQUI-join on the bucket and refine with the exact range predicate. The
  * shuffle is hash-partitioned by bucket — co-located, skew handled by AQE.
  *
  * Columns are epoch seconds (cast timestamps with `unix_timestamp`).
  */
object RangeJoin {

  /** @param points     left relation with a numeric point column
    * @param pointCol   epoch-seconds point
    * @param intervals  right relation with [loCol, hiCol] closed intervals
    * @param bucketSecs bucket width; choose ≥ typical interval span
    */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketSecs: Long): DataFrame = {
    val p = points.withColumn("__bucket", floorDiv(col(pointCol), bucketSecs))
    val i = intervals.withColumn("__bucket",
      explode(sequence(floorDiv(col(loCol), bucketSecs), floorDiv(col(hiCol), bucketSecs))))
    p.join(i, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  private def floorDiv(c: Column, d: Long): Column =
    floor(c.cast("double") / d).cast("long") // epoch seconds < 2^53: exact
}
