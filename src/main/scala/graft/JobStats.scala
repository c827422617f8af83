package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic overhead profile: per catalog query, the number of Spark
  * jobs, stages, and tasks one execution dispatches. On an overhead-bound
  * gate corpus (15 MB at sf0.1) wall time is mostly scheduler fixed cost ×
  * these counts, and — unlike wall time on a noisy shared host — the counts
  * are exactly reproducible, so optimization work can be measured against
  * them. At 100 TB the same counts bound the per-query DAG depth (jobs ≈
  * barriers) and scheduler pressure (tasks).
  *
  * Usage: runMain graft.JobStats [name-substring...] — prints one JSON line
  * {"query": {"jobs":J,"stages":S,"tasks":T}, ...}.
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    // measurement knob: SPARK_GRAFT_AQE=0 disables adaptive execution for
    // the session (runtime-settable), to quantify AQE's per-exchange
    // stage-job dispatch against gate-scale inputs
    if (sys.env.get("SPARK_GRAFT_AQE").contains("0"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0L; @volatile var stages = 0L; @volatile var tasks = 0L
    val jobLog = sys.env.get("SPARK_GRAFT_JOBLOG").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (jobLog) System.err.println(s"[job] ${j.jobId} stages=${j.stageInfos.size} " +
          s"tasks=${j.stageInfos.map(_.numTasks).sum} " +
          j.stageInfos.map(_.name).mkString(" | "))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val wanted = args.toSeq
    val catalog = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted.exists(n.contains) }
    // warm pass: codegen + file listing outside the counted region
    catalog.foreach { case (_, fn) =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // drain the async listener bus ONCE between the warm pass and the
    // first counter reset — late warm-pass events landing after the reset
    // would inflate the first query's supposedly deterministic counts
    // (the same beat each measured query already gets below)
    Thread.sleep(300)
    val out = catalog.map { case (name, fn) =>
      jobs = 0; stages = 0; tasks = 0
      val ok = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[jobstats] $name failed: ${e.getMessage}"); false
      }
      // listener bus is async — give it a beat to drain before reading
      // the counters (count determinism tolerates a generous wait)
      Thread.sleep(300)
      s""""$name":{"jobs":$jobs,"stages":$stages,"tasks":$tasks,"ok":$ok}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
