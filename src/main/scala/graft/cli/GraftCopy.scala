package graft.cli

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.recon.Reconciler
import graft.schema.SchemaReconciler

/** CLI driver — the reference's `main.go` re-expressed over the engine:
  * mode dispatch (`parseMode`, `/root/reference/main.go:25-43`), config
  * check (`/root/reference/config/config.go:66-71`), exit-status bitmask
  * (`/root/reference/status/status.go:22-43`).
  *
  * Modes (exactly one required, as the reference enforces):
  *   --info     dry-run: print per-partition verdicts, mutate nothing
  *              (≙ `copy.Info`, `/root/reference/copy/copy.go:12-137`)
  *   --sync     verdicts + repair the destination
  *              (≙ `copy.Copy`, `/root/reference/copy/copy.go:139-273`)
  *   --version  print version and exit (`/root/reference/version.go:20-23`)
  *
  * Usage: GraftCopy (--info|--sync|--version) <srcDir> <dstDir> <table> <partitionKeyExpr>
  *   e.g. GraftCopy --info /root/testdata/sf0.001 /tmp/dst lineitem "date_format(l_shipdate,'yyyyMM')"
  */
object GraftCopy {

  val Name = "graft-copy"
  val VersionString = "0.1.0"

  /** Exit-status flags OR-ed like the reference bitmask (where, notably,
    * both constants are 1 — `status/status.go:7-10`; ours are distinct). */
  object Status {
    val Ok = 0
    val DataFail = 1
    val HashFail = 2
    val UsageFail = 64
  }

  sealed trait Mode
  case object Info extends Mode
  case object Sync extends Mode
  case object Version extends Mode

  /** `parseMode`: exactly one mode flag, else usage error. */
  def parseMode(args: Seq[String]): Either[String, Mode] = {
    val modes = args.collect {
      case "--info" | "-i" => Info
      case "--sync" | "-s" => Sync
      case "--version" | "-v" => Version
    }
    modes match {
      case Seq(m) => Right(m)
      case Seq() => Left("exactly one of --info/--sync/--version is required")
      case _ => Left("modes are mutually exclusive")
    }
  }

  def main(args: Array[String]): Unit = sys.exit(run(args.toIndexedSeq))

  def run(args: Seq[String]): Int = parseMode(args) match {
    case Left(err) =>
      System.err.println(s"$Name: $err"); Status.UsageFail
    case Right(Version) =>
      println(s"$Name $VersionString"); Status.Ok
    case Right(mode) =>
      val rest = args.filterNot(_.startsWith("-"))
      if (rest.length != 4) {
        System.err.println(s"$Name: expected <srcDir> <dstDir> <table> <partitionKeyExpr>")
        return Status.UsageFail
      }
      val Seq(srcDir, dstDir, table, partKey) = rest
      val spark = GraftSession.local()
      try reconcile(spark, srcDir, dstDir, table, partKey, execute = mode == Sync)
      finally spark.stop()
  }

  def reconcile(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, table: String, partKey: String, execute: Boolean): Int = {
    val src = Tables.load(spark, srcDir, table)
    if (!Tables.exists(dstDir, table) && !new java.io.File(s"$dstDir/$table").exists()) {
      // dest absent entirely -> full copy in sync mode (the degenerate
      // "every partition is missing" case)
      if (execute) {
        src.withColumn("__part", expr(partKey))
          .write.partitionBy("__part").mode("overwrite").parquet(s"$dstDir/$table")
        println(s"[$Name] full copy of $table -> $dstDir/$table")
        return Status.Ok
      } else {
        println(s"[$Name] destination missing: would copy everything")
        return Status.DataFail
      }
    }
    val flatLayout = Tables.exists(dstDir, table)
    val dstPath = if (flatLayout) s"$dstDir/$table.parquet" else s"$dstDir/$table"
    val dst = spark.read.parquet(dstPath)

    // schema reconciliation: intersected columns, casts planned once
    val plan = SchemaReconciler.castPlan(src.schema, dst.schema)
    val commonCols = plan.map(_._1)
    val srcCast = plan.map(_._2) // B18: source side hashes cast expressions
    val dstCols = commonCols.map(col)

    val srcK = src.withColumn("__part", expr(partKey))
    val dstK = dst.withColumn("__part", expr(partKey))
    val verdicts = Reconciler.verdicts(
      srcK, dstK, Seq("__part" -> col("__part")), srcCast, dstCols)

    val rows = verdicts.orderBy("__part").collect()
    // pre-flight (copy.go:35-41,162-168) — totals derived from the verdict
    // aggregates already on the driver, not two extra full scans
    val (srcTotal, dstTotal) =
      (rows.map(_.getAs[Long]("src_rows")).sum, rows.map(_.getAs[Long]("dst_rows")).sum)
    Reconciler.preflight(srcTotal, dstTotal)
      .foreach(w => println(s"[$Name] warning: $w"))
    rows.foreach { r =>
      println(s"[$Name] part=${r.get(0)} src=${r.get(1)} dst=${r.get(2)} -> ${r.getAs[String]("verdict")}")
    }
    val dirty = rows.exists(r => r.getAs[String]("verdict") != Reconciler.Verdict.Skip)

    if (execute && dirty) {
      val srcForWrite = srcK.select((srcCast :+ col("__part")): _*)
      if (flatLayout) {
        // A single-file destination can't be partition-overwritten in
        // place; migrate it to the partitioned directory layout, then the
        // per-partition repair path applies on every later run.
        val newPath = s"$dstDir/$table"
        srcForWrite.write.partitionBy("__part").mode("overwrite").parquet(newPath)
        new java.io.File(dstPath).delete()
        println(s"[$Name] migrated flat destination to partitioned layout at $newPath")
        Status.Ok
      } else {
        val repaired = Reconciler.repair(spark, verdicts, srcForWrite, "__part", dstPath)
        println(s"[$Name] repaired partitions: ${repaired.mkString(", ")}")
        Status.Ok
      }
    } else if (dirty) Status.HashFail
    else Status.Ok
  }
}
