package graft.sim

import org.apache.spark.sql.functions._

/** Floor-calibration diagnostic for the q102 recall gate (run manually:
  * `sbt "Test/runMain graft.sim.PqCalibrate <sfDir> [shortlist]"`) —
  * prints per-query |PQ+rerank ∩ exact top-10| so the catalog floor can
  * be set strictly under the deterministic minimum (the q35/q54
  * recalibration recipe). */
object PqCalibrate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val shortlist = args.lift(1).map(_.toInt).getOrElse(250)
    val spark = graft.core.GraftSession.local(16)
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def report(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val approx = df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val hits = exact.keys.toSeq.sorted
        .map(q => q -> approx.getOrElse(q, Set.empty).count(exact(q)))
      println(s"[pq-calibrate] $tag $dir shortlist=$shortlist hits=" +
        hits.map { case (q, h) => s"$q:$h" }.mkString(","))
    }
    report("pq-rerank", Similarity.pqKnnRerank(queries, emb, "vec_id", "embedding",
      k = 10, shortlist = shortlist, m = 8, kCodes = 32, lloydIters = 1))
    report("ivf-pq", Similarity.ivfPqKnn(queries, emb, "vec_id", "embedding",
      k = 10, nCentroids = 16, nProbe = 8, shortlist = shortlist,
      m = 8, kCodes = 32, lloydIters = 1))
  }
}
