package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.fp.Fingerprint
import graft.functions.Functions
import graft.recon.Reconciler

/** The reference's relational operator surface (SURVEY §2A) as runnable
  * queries over the fixture tables, each paired with ANSI SQL for the DuckDB
  * oracle (`oracles`). Conventions:
  *  - every query ends in a deterministic ORDER BY (unique tiebreak) so the
  *    row stream is identical on both sides;
  *  - money aggregates go through DECIMAL casts (exact, order-independent —
  *    double sums would differ between engines by summation order) and are
  *    EMITTED as BIGINT scaled units (x100 or x10000 "cents"): round 2 showed the
  *    driver's hasher canonicalizes Spark parquet decimal128 and DuckDB
  *    decimals differently, while integers are hash-stable everywhere;
  *  - aliases match the oracle SQL exactly (driver hashes by column name).
  */
object ReferenceQueries {
  type Q = (SparkSession, String) => DataFrame

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  val all: Map[String, Q] = Map(
    // A1+A4 scan + projection (column pruning reaches the parquet footer)
    "q01_scan_project" -> ((s, dir) =>
      li(s, dir).select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // A6 equality filter
    "q02_filter_eq" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .filter(col("c_nationkey") === 5)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")),

    // A7 time-range filter (partition min/max bounds → closed range)
    "q03_filter_range" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01 00:00:00").cast("timestamp") &&
                col("l_shipdate") <= lit("1995-03-31 23:59:59").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // A8 conjunction of per-key predicates
    "q04_filter_conj" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
                col("l_shipdate") <= lit("1996-12-31 23:59:59").cast("timestamp") &&
                col("l_returnflag") === "R" && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // A9 ungrouped count
    "q05_count" -> ((s, dir) =>
      li(s, dir).agg(count(lit(1)).as("cnt"))),

    // A9 filtered count
    "q06_count_filtered" -> ((s, dir) =>
      li(s, dir).filter(col("l_returnflag") === "A")
        .agg(count(lit(1)).as("cnt"))),

    // A5 cast matrix projection (toInt/toString/toDate arms)
    "q07_cast_project" -> ((s, dir) =>
      li(s, dir)
        .orderBy("l_orderkey", "l_linenumber")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("okey_str"),
          col("l_shipdate").cast("date").as("ship_date"),
          col("l_linenumber").cast("bigint").as("ln_big"))),

    // A12+A13+A18 partition inventory: per-partition stats, largest first
    // (the system.parts replacement: one shuffle computes all partitions)
    "q08_partition_inventory" -> ((s, dir) =>
      li(s, dir)
        .groupBy(date_format(col("l_shipdate"), "yyyyMM").as("part"))
        .agg(
          count(lit(1)).as("n_rows"),
          min("l_shipdate").as("min_time"),
          max("l_shipdate").as("max_time"),
          // exact integer cents: decimal sums are exact and order-independent,
          // and a BIGINT emission is hash-stable in every driver/oracle dtype
          // canonicalization (DECIMAL output hash-mismatched in round 2)
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("bytes_proxy"))
        .orderBy(desc("bytes_proxy"), col("part"))),

    // A5 toUUIDOrZero or-zero semantics over derived valid/invalid inputs
    "q09_uuid_or_zero" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
      val h = md5(col("p_partkey").cast("string"))
      val uuidStr = when(col("p_partkey") % 3 === 0,
        concat_ws("-", substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
          substring(h, 17, 4), substring(h, 21, 12)))
        .otherwise(concat(lit("not-a-uuid-"), col("p_partkey").cast("string")))
      p.select(col("p_partkey"), Functions.uuidOrZero(uuidStr).as("uuid_norm"))
        .orderBy("p_partkey")
    }),

    // A5 toIPv4: numeric + canonical forms, invalid → null
    "q10_ipv4" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val ipStr = when(col("c_custkey") % 10 === 0, lit("999.1.2.3"))
        .otherwise(concat_ws(".",
          col("c_custkey") % 256, (col("c_custkey") * 7) % 256,
          (col("c_custkey") * 13) % 256, (col("c_custkey") % 254) + 1))
      c.select(
        col("c_custkey"),
        Functions.ipv4ToLong(ipStr).as("ip_num"),
        Functions.ipv4Canonical(ipStr).as("ip_canon"))
        .orderBy("c_custkey")
    }),

    // A14 formatReadableSize
    "q11_format_size" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          Functions.formatReadableSize(col("o_totalprice") * 1000.0).as("size_h"))
        .orderBy("o_orderkey")),

    // A15 catalog describe as data
    "q12_describe" -> ((s, dir) =>
      Tables.describe(s, dir, "lineitem").select("col_name").orderBy("col_name")),

    // A19 partition delete semantics: the surviving relation after deleting
    // one partition (delete = rewrite-without, no in-place mutation)
    "q13_delete_partition" -> ((s, dir) =>
      li(s, dir)
        .filter(!(date_format(col("l_shipdate"), "yyyyMM") === "199605"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    // B15 the reconciliation verdict (flagship): src vs derived dst with one
    // missing partition (→copy) and one corrupted partition (→delete_recopy)
    "q14_recon_verdict" -> ((s, dir) => reconVerdict(s, dir)),

    // A12 grouped aggregation (TPC-H Q1 shape, decimal-exact)
    "q15_groupby_agg" -> ((s, dir) =>
      li(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02 23:59:59").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)").as("sum_qty"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)").as("sum_base"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)").as("sum_disc"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    // join pipeline: fact ⋈ fact ⋈ broadcast dims, grouped revenue by nation
    "q16_join_agg" -> ((s, dir) => {
      val l = li(s, dir)
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT)").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    }),

    // sort + limit (top-k) with deterministic tiebreak
    "q17_topk" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)),

    // window function: per-customer order sequence
    "q18_window" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("o_custkey")
              .orderBy("o_orderdate", "o_orderkey")).as("rn"))
        .orderBy("o_orderkey")),

    // time-series tumbling aggregation over events (ns timestamps)
    "q19_events_window" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)").as("sum_value"))
        .orderBy("hour", "event_type")),

    // JSON extraction from events.props
    "q20_json_extract" -> ((s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").as("k"))
        .orderBy("event_id")),

    // A10+A11 order-independent content fingerprint over a projected
    // subquery — emitted in the ORACLE-PORTABLE (md5-derived) hash family
    // so the driver's DuckDB gate verifies the flagship verification
    // semantic itself bit-for-bit (round-2 verdict #3). The xxhash64
    // production fingerprint keeps its own coverage via q14 (the verdict
    // ladder consumes it) and FingerprintSpec.
    "q21_fingerprint" -> ((s, dir) => {
      val df = li(s, dir).filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      Fingerprint.portableOfDataFrame(df, cols)
    }),

    // A10 per-partition fingerprint map (the one-pass system.parts+hash
    // scan), portable hash family — full 11-column row canonicalization
    "q22_fingerprint_by_partition" -> ((s, dir) => {
      val df = li(s, dir)
      Fingerprint.byPartitionPortable(df,
          Seq("part" -> date_format(col("l_shipdate"), "yyyyMM")), df.columns.toSeq)
        .orderBy("part")
    }),

    // A15+A16+A17 through a REAL session catalog (not paths): register an
    // external table, assert existence via spark.catalog.tableExists, and
    // emit its DESCRIBE surface via spark.catalog.listColumns — the
    // catalog-backed variant of q12
    "q86_catalog_describe" -> ((s, dir) => {
      val tbl = Tables.registerExternal(s, dir, "lineitem")
      try {
        val exists = s.catalog.tableExists(tbl)
        import s.implicits._
        s.catalog.listColumns(tbl).collect().map(_.name).toSeq.sorted
          .map(c => (c, exists)).toDF("col_name", "table_exists")
          .orderBy("col_name")
      } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    }),

    // A18 through the catalog: a Hive-partitioned external table's SHOW
    // PARTITIONS listing joined to per-partition counts — parity between
    // the CATALOG's partition inventory and the data itself (a partition
    // the catalog lists but the data lacks would emit n_rows = -1 and
    // hash-mismatch; one it misses would drop a row and row-mismatch)
    "q87_catalog_partitions" -> ((s, dir) => {
      // The partitioned table is SETUP, not the operator under test: create
      // it once per (process, dir) so repeated bench passes time the
      // catalog-parity query (SHOW PARTITIONS ⨝ per-partition counts), not a
      // partitioned rewrite. The table stays registered for the process
      // lifetime; a shutdown hook removes the temp warehouse.
      // cache validated against the CURRENT session's catalog: a session
      // restart in the same JVM drops the registered table, and blindly
      // reusing the stale name would poison q87 for the process lifetime
      val tbl = q87Table.get(dir).filter(s.catalog.tableExists).getOrElse {
        val name = s"graft_parts_${java.util.UUID.randomUUID.toString.take(8)}"
        val wh = graft.core.Fs.scratchDir("graft_warehouse")
        sys.addShutdownHook(graft.core.Fs.deleteRecursively(wh))
        // a two-year slice: the catalog-parity semantic needs SOME
        // partitioned table, not a full-table rewrite
        Tables.writePartitionedTable(
          li(s, dir)
            .filter(col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            .withColumn("part", date_format(col("l_shipdate"), "yyyyMM")),
          name, s"$wh/$name", "part")
        q87Table(dir) = name
        name
      }
      val parts = s.sql(s"SHOW PARTITIONS $tbl")
        .select(regexp_extract(col("partition"), "^part=(.*)$", 1).as("part"))
      val counts = s.table(tbl).groupBy("part").agg(count(lit(1)).as("n_rows"))
      parts.join(counts, Seq("part"), "left")
        .select(col("part"), coalesce(col("n_rows"), lit(-1L)).as("n_rows"))
        .orderBy("part")
    })
  )

  /** q87's per-process setup cache: dir → registered table name. */
  private val q87Table = scala.collection.concurrent.TrieMap.empty[String, String]

  /** B15 reconciliation on a derived pair (FIXTURES.md §B): dst is src minus
    * partition 199602 (→ copy) with 199603 perturbed (→ delete_recopy). */
  def reconVerdict(s: SparkSession, dir: String): DataFrame = {
    val base = li(s, dir)
    val contentCols = base.columns.toSeq.map(col)
    val src = base.withColumn("part", date_format(col("l_shipdate"), "yyyyMM"))
    val dst = src.filter(col("part") =!= "199602")
      .withColumn("l_quantity",
        when(col("part") === "199603" && col("l_linenumber") === 1, col("l_quantity") + 1)
          .otherwise(col("l_quantity")))
    Reconciler.verdicts(src, dst, Seq("part" -> col("part")), contentCols, contentCols)
      .select("part", "src_rows", "dst_rows", "verdict")
      .orderBy("part")
  }

  private val liCols = "l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate"

  val oracles: Map[String, String] = Map(
    "q01_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q02_filter_eq" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_nationkey = 5 ORDER BY c_custkey",
    "q03_filter_range" ->
      "SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00' AND l_shipdate <= TIMESTAMP '1995-03-31 23:59:59' ORDER BY l_orderkey, l_linenumber",
    "q04_filter_conj" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND l_shipdate <= TIMESTAMP '1996-12-31 23:59:59' AND l_returnflag = 'R' AND l_quantity > 25 ORDER BY l_orderkey, l_linenumber",
    "q05_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q06_count_filtered" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'A'",
    "q07_cast_project" ->
      "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS qty_int, CAST(l_orderkey AS VARCHAR) AS okey_str, CAST(l_shipdate AS DATE) AS ship_date, CAST(l_linenumber AS BIGINT) AS ln_big FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q08_partition_inventory" ->
      "SELECT strftime(l_shipdate, '%Y%m') AS part, count(*) AS n_rows, min(l_shipdate) AS min_time, max(l_shipdate) AS max_time, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS bytes_proxy FROM lineitem GROUP BY 1 ORDER BY bytes_proxy DESC, part",
    "q09_uuid_or_zero" ->
      ("SELECT p_partkey, CASE WHEN u ~ '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$' THEN lower(u) ELSE '00000000-0000-0000-0000-000000000000' END AS uuid_norm FROM " +
        "(SELECT p_partkey, CASE WHEN p_partkey % 3 = 0 THEN substr(h,1,8)||'-'||substr(h,9,4)||'-'||substr(h,13,4)||'-'||substr(h,17,4)||'-'||substr(h,21,12) ELSE 'not-a-uuid-'||CAST(p_partkey AS VARCHAR) END AS u FROM (SELECT p_partkey, md5(CAST(p_partkey AS VARCHAR)) AS h FROM part)) ORDER BY p_partkey"),
    "q10_ipv4" ->
      ("WITH ips AS (SELECT c_custkey, CASE WHEN c_custkey % 10 = 0 THEN '999.1.2.3' ELSE (c_custkey % 256)||'.'||((c_custkey*7) % 256)||'.'||((c_custkey*13) % 256)||'.'||((c_custkey % 254)+1) END AS ip FROM customer), " +
        "parsed AS (SELECT c_custkey, CASE WHEN regexp_matches(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$') AND CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 1) AS BIGINT) <= 255 AND CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 2) AS BIGINT) <= 255 AND CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 3) AS BIGINT) <= 255 AND CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 4) AS BIGINT) <= 255 " +
        "THEN CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 1) AS BIGINT)*16777216 + CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 2) AS BIGINT)*65536 + CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 3) AS BIGINT)*256 + CAST(regexp_extract(ip, '^([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})\\.([0-9]{1,3})$', 4) AS BIGINT) END AS ip_num FROM ips) " +
        "SELECT c_custkey, ip_num, CASE WHEN ip_num IS NULL THEN NULL ELSE ((ip_num//16777216) % 256)||'.'||((ip_num//65536) % 256)||'.'||((ip_num//256) % 256)||'.'||(ip_num % 256) END AS ip_canon FROM parsed ORDER BY c_custkey"),
    "q11_format_size" ->
      ("SELECT o_orderkey, CASE WHEN b < 1024 THEN printf('%.2f B', b) WHEN b < 1048576 THEN printf('%.2f KiB', b/1024) WHEN b < 1073741824 THEN printf('%.2f MiB', b/1048576) WHEN b < 1099511627776 THEN printf('%.2f GiB', b/1073741824) ELSE printf('%.2f TiB', b/1099511627776) END AS size_h " +
        "FROM (SELECT o_orderkey, o_totalprice * 1000.0 AS b FROM orders) ORDER BY o_orderkey"),
    "q12_describe" ->
      "SELECT column_name AS col_name FROM (DESCRIBE SELECT * FROM lineitem) ORDER BY col_name",
    "q13_delete_partition" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE NOT (strftime(l_shipdate, '%Y%m') = '199605') ORDER BY l_orderkey, l_linenumber",
    "q14_recon_verdict" ->
      (s"WITH src AS (SELECT *, strftime(l_shipdate, '%Y%m') AS part FROM lineitem), " +
        s"dst AS (SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, CASE WHEN part = '199603' AND l_linenumber = 1 THEN l_quantity + 1 ELSE l_quantity END AS l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate, part FROM src WHERE part <> '199602'), " +
        s"sa AS (SELECT part, count(*) AS src_rows, bit_xor(hash($liCols)) AS sfp FROM src GROUP BY part), " +
        s"da AS (SELECT part, count(*) AS dst_rows, bit_xor(hash($liCols)) AS dfp FROM dst GROUP BY part) " +
        "SELECT coalesce(sa.part, da.part) AS part, coalesce(src_rows, 0) AS src_rows, coalesce(dst_rows, 0) AS dst_rows, " +
        "CASE WHEN sa.part IS NULL THEN 'dest_only' WHEN dst_rows IS NULL OR dst_rows = 0 THEN 'copy' WHEN src_rows = dst_rows AND sfp = dfp THEN 'skip' ELSE 'delete_recopy' END AS verdict " +
        "FROM sa FULL OUTER JOIN da ON sa.part = da.part ORDER BY part"),
    "q15_groupby_agg" ->
      "SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS sum_disc, count(*) AS n_rows FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59' GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus",
    "q16_join_agg" ->
      "SELECT n_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS revenue, count(*) AS n_rows FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name ORDER BY n_name",
    "q17_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",
    "q18_window" ->
      "SELECT o_orderkey, o_custkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders ORDER BY o_orderkey",
    "q19_events_window" ->
      "SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type, count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value FROM events GROUP BY 1, 2 ORDER BY hour, event_type",
    "q20_json_extract" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events ORDER BY event_id",
    "q21_fingerprint" -> {
      import PortableSql._
      val c = Seq(canon("l_orderkey"), canon("l_linenumber"),
        canonDouble("l_quantity"), canon("l_returnflag"))
      s"SELECT ${fpAgg(c)} AS fp_portable, count(*) AS n_rows FROM lineitem " +
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
    },
    "q22_fingerprint_by_partition" -> {
      import PortableSql._
      val c = Seq(canon("l_orderkey"), canon("l_partkey"), canon("l_suppkey"),
        canon("l_linenumber"), canonDouble("l_quantity"),
        canonDouble("l_extendedprice"), canonDouble("l_discount"),
        canonDouble("l_tax"), canon("l_returnflag"), canon("l_linestatus"),
        canonTimestamp("l_shipdate"))
      s"SELECT strftime(l_shipdate, '%Y%m') AS part, count(*) AS n_rows, " +
        s"${fpAgg(c)} AS fp_portable FROM lineitem GROUP BY 1 ORDER BY part"
    },
    "q86_catalog_describe" ->
      ("SELECT column_name AS col_name, TRUE AS table_exists " +
        "FROM (DESCRIBE SELECT * FROM lineitem) ORDER BY col_name"),
    "q87_catalog_partitions" ->
      ("SELECT strftime(l_shipdate, '%Y%m') AS part, count(*) AS n_rows FROM lineitem " +
        "WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00' GROUP BY 1 ORDER BY part")
  )
}
