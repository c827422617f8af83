package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A15–A18 against a REAL session catalog (spark.catalog / spark.table /
  * SHOW PARTITIONS) instead of raw paths. */
class CatalogSpec extends SparkSpec {

  test("registerExternal: tableExists, listColumns == path describe, DROP keeps the data") {
    val tbl = Tables.registerExternal(spark, sf001, "lineitem")
    try {
      assert(spark.catalog.tableExists(tbl))
      val viaCatalog = spark.catalog.listColumns(tbl).collect().map(_.name).toSet
      val viaPath = Tables.load(spark, sf001, "lineitem").columns.toSet
      assert(viaCatalog == viaPath)
      assert(spark.table(tbl).count() ==
        Tables.load(spark, sf001, "lineitem").count())
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
    assert(!spark.catalog.tableExists(tbl))
    assert(Tables.exists(sf001, "lineitem")) // external: data survives DROP
  }

  test("SHOW PARTITIONS parity with Fingerprint.byPartition keys and counts") {
    val li = Tables.load(spark, sf001, "lineitem")
    val tbl = s"graft_parts_spec_${java.util.UUID.randomUUID.toString.take(8)}"
    val wh = tmpDir("catalog_wh")
    try {
      Tables.writePartitionedTable(
        li.withColumn("part", date_format(col("l_shipdate"), "yyyyMM")),
        tbl, s"$wh/$tbl", "part")
      val shown = spark.sql(s"SHOW PARTITIONS $tbl")
        .select(regexp_extract(col("partition"), "^part=(.*)$", 1).as("part"))
        .collect().map(_.getString(0)).toSet
      val fp = graft.fp.Fingerprint.byPartition(li,
          Seq("part" -> date_format(col("l_shipdate"), "yyyyMM")),
          li.columns.toSeq.map(col))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(shown == fp.keySet)
      // per-partition counts through the CATALOG table match the fingerprint scan
      val catCounts = spark.table(tbl).groupBy("part").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(catCounts == fp.view.mapValues(identity).toMap)
      // partition pruning: a single-partition read through the catalog
      val one = fp.keySet.min
      assert(spark.table(tbl).filter(col("part") === one).count() == fp(one))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
