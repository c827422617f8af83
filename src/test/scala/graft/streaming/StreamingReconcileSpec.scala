package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed fingerprint equals the batch computation") {
    val stream = StreamingReconcile.readEvents(spark, sf001)
    val q = StreamingReconcile.windowedFingerprint(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("winfp")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("winfp").orderBy("win_start", "event_type").collect()
      val batch = StreamingReconcile.windowedFingerprint(
        graft.core.Tables.load(spark, sf001, "events"), watermark = None)
        .orderBy("win_start", "event_type").collect()
      assert(streamed.length == batch.length && streamed.length > 0)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("hourlyAggStream (q55) equals the q19 batch aggregate, twice in a row") {
    def batch = graft.core.Tables.load(spark, sf001, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)").as("sum_value"))
      .orderBy("hour", "event_type").collect().toSeq
    val expected = batch
    // twice: re-running must stop the prior named stream and clean its
    // temp parquet-sink dir (Verify and Bench both invoke the query
    // repeatedly in one session; the harness sinks via foreachBatch →
    // parquet, not a memory sink)
    (1 to 2).foreach { _ =>
      val got = StreamingReconcile.hourlyAggStream(spark, sf001)
        .orderBy("hour", "event_type").collect().toSeq
      assert(got.nonEmpty && got == expected)
    }
  }

  test("fingerprint store: two-batch merge and the streamed store equal a full recompute") {
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val contentCols = Seq(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val keys = Seq("event_type" -> col("event_type"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = canon(graft.fp.Fingerprint.byPartition(ev, keys, contentCols))

    // manual two-batch merge (exercises the store-exists path)
    val store1 = tmpDir("fpstore1") + "/store"
    StreamingReconcile.mergeFingerprintBatch(spark, store1,
      ev.filter(col("event_id") % 2 === 0), keys, contentCols, batchId = 0L)
    StreamingReconcile.mergeFingerprintBatch(spark, store1,
      ev.filter(col("event_id") % 2 =!= 0), keys, contentCols, batchId = 1L)
    assert(canon(spark.read.parquet(store1)) == full)
    // at-least-once replay of an already-merged batch is a no-op (XOR
    // would otherwise self-cancel the fingerprints)
    StreamingReconcile.mergeFingerprintBatch(spark, store1,
      ev.filter(col("event_id") % 2 =!= 0), keys, contentCols, batchId = 1L)
    assert(canon(spark.read.parquet(store1)) == full)

    // end-to-end: an actual availableNow stream maintains the same store
    val store2 = tmpDir("fpstore2") + "/store"
    val streamed = StreamingReconcile.fingerprintStoreStream(spark, sf001, store2)
    assert(canon(streamed) == full)
  }

  test("fingerprint store: crash between delete and rename recovers; replay after recovery is a no-op") {
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val contentCols = Seq(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val keys = Seq("event_type" -> col("event_type"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_type").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val store = tmpDir("fpstore_crash") + "/store"
    StreamingReconcile.mergeFingerprintBatch(spark, store,
      ev.filter(col("event_id") % 2 === 0), keys, contentCols, batchId = 0L)
    StreamingReconcile.mergeFingerprintBatch(spark, store,
      ev.filter(col("event_id") % 2 =!= 0), keys, contentCols, batchId = 1L)
    val full = canon(StreamingReconcile.readFingerprintStore(spark, store))
    // simulate dying between fs.delete(store) and fs.rename(tmp → store):
    // the completed new store sits at _tmp, the store path is gone
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + "_tmp"))
    // the checkpointed replay of batch 1 must first adopt _tmp as the
    // store, then skip the merge (its embedded batch id is current) —
    // a re-merge would XOR-cancel the fingerprints and double the counts
    StreamingReconcile.mergeFingerprintBatch(spark, store,
      ev.filter(col("event_id") % 2 =!= 0), keys, contentCols, batchId = 1L)
    assert(canon(StreamingReconcile.readFingerprintStore(spark, store)) == full)
  }

  test("stream-stream attribution join equals the batch interval join") {
    val got = StreamingReconcile.attributionJoinStream(spark, sf001)
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val expected = ev.filter(col("event_type") =!= "signup")
      .join(s, col("user_id") === col("s_user") &&
        col("ts") >= col("s_ts") &&
        col("ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("seenDedupStream: in-run fold-forward across micro-batches, second run drops redeliveries") {
    import org.apache.spark.sql.streaming.Trigger
    // controlled two-file ingest so the CROSS-BATCH fold is observable:
    // file2 redelivers file1's text under a new id — whichever file lands
    // first, exactly one of the pair survives (the q103 gate corpus keeps
    // in-stream texts unique precisely to stay batch-order independent;
    // this spec covers the order-dependent case the gate can't)
    val scratch = tmpDir("seen_stream_spec")
    val store = s"$scratch/store"
    val inDir = s"$scratch/in"
    val sink = s"$scratch/out"
    def doc(id: Long, text: String) = (id, text, "en", "src", text.length.toLong)
    val schema = Seq(doc(0, "x")).toDF("doc_id", "text", "lang", "source", "n_chars").schema
    Seq(doc(1, "first unique text"), doc(2, "shared payload text"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/f1")
    Seq(doc(3, "shared payload text"), doc(4, "second unique text"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/f2")
    def runStream(tag: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(inDir)
      val q = stream.writeStream.queryName(s"seen_stream_spec_$tag")
        .option("checkpointLocation", s"$scratch/ckpt_$tag")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val bs = b.sparkSession
          val shard = s"${tag}_batch_$id"
          if (!graft.dedup.SeenStore.processedShards(bs, store).contains(shard)) {
            val survivors = graft.dedup.SeenStore
              .filter(bs, store, b, "text").localCheckpoint(true)
            survivors.withColumn("batch", lit(s"${tag}_$id"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch").parquet(sink)
            graft.dedup.SeenStore.update(bs, store, survivors, "text", shard)
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runStream("r1")
    val kept1 = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // both unique texts kept; exactly ONE of the shared-text pair kept
    assert(kept1.contains(1L) && kept1.contains(4L))
    assert(kept1.intersect(Set(2L, 3L)).size == 1, s"kept=$kept1")
    assert(graft.dedup.SeenStore.read(spark, store).get.count() == 3)
    // run 2 over the SAME files and store (fresh checkpoint): everything
    // is a redelivery now — nothing new lands, the store is unchanged
    runStream("r2")
    val kept2 = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == kept1, s"run 2 must drop every redelivery: $kept2 vs $kept1")
    assert(graft.dedup.SeenStore.read(spark, store).get.count() == 3)
  }

  test("neardupDedupStream protocol: cross-batch NEAR-dup fold, second run drops redeliveries") {
    import org.apache.spark.sql.streaming.Trigger
    // the q110 protocol on a controlled two-file ingest: file2 carries a
    // NEAR-dup (one token appended, exact Jaccard ≥ 0.8) of file1's doc —
    // the store fold across micro-batches must drop it, while unique docs
    // and the first-seen member survive; a full second run over the same
    // files is all redeliveries and must change nothing.
    val scratch = tmpDir("neardup_stream_spec")
    val store = s"$scratch/store"
    val inDir = s"$scratch/in"
    val sink = s"$scratch/out"
    val base = (1 to 12).map(i => s"tok$i").mkString(" ")
    def doc(id: Long, text: String) = (id, text, "en", "src", text.length.toLong)
    val schema = Seq(doc(0, "x")).toDF("doc_id", "text", "lang", "source", "n_chars").schema
    Seq(doc(1, base), doc(2, (1 to 12).map(i => s"other$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/f1")
    Seq(doc(3, s"$base tail"), doc(4, (1 to 12).map(i => s"fresh$i").mkString(" ")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/f2")
    // pin admission order: f1's batch must fold before f2 probes
    Option(new java.io.File(s"$inDir/f1").listFiles()).getOrElse(Array.empty)
      .foreach(_.setLastModified(1700000000000L))
    Option(new java.io.File(s"$inDir/f2").listFiles()).getOrElse(Array.empty)
      .foreach(_.setLastModified(1700000060000L))
    def runStream(tag: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(inDir)
      val q = stream.writeStream.queryName(s"neardup_stream_spec_$tag")
        .option("checkpointLocation", s"$scratch/ckpt_$tag")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val bs = b.sparkSession
          val shard = s"${tag}_batch_$id"
          if (!graft.dedup.NearDupStore.processedShards(bs, store).contains(shard)) {
            val survivors = graft.dedup.NearDupStore.filterNew(bs, store, b,
                "text", "doc_id", minJaccard = 0.8, maxBucket = 0)
              .localCheckpoint(true)
            survivors.withColumn("batch", lit(s"${tag}_$id"))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch").parquet(sink)
            graft.dedup.NearDupStore.update(bs, store, survivors,
              "text", "doc_id", shard)
          }
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runStream("r1")
    val kept1 = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(1L, 2L, 4L), s"kept=$kept1") // 3 is 1's near-dup
    assert(graft.dedup.NearDupStore.read(spark, store).get.count() == 3)
    // run 2 (fresh checkpoint, same store): every doc is now a near-dup
    // of stored history — nothing new lands, the store is unchanged
    runStream("r2")
    val kept2 = spark.read.parquet(sink).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == kept1, s"run 2 must drop every redelivery: $kept2")
    assert(graft.dedup.NearDupStore.read(spark, store).get.count() == 3)
  }

  test("checkpoint resume: killed dedup stream restarts exactly-once (q65 shape)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val root = tmpDir("ckpt_resume")
    val src = s"$root/src"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_type", StringType)))
    def writeFile(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("user_id", "event_type").coalesce(1)
        .write.mode("overwrite").parquet(s"$src/$name")
    // crash switch lives on the driver (foreachBatch runs driver-side)
    @volatile var crashAtBatch = -1L
    def runStream(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/*")
        .dropDuplicates("user_id")
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          if (id == crashAtBatch) {
            crashAtBatch = -1L
            throw new RuntimeException("injected crash")
          }
          b.write.mode("append").parquet(sink)
        }
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: one file, completes batch 0; user 1 and 2 enter the state store
    writeFile("f1", Seq((1L, "a"), (2L, "a")))
    runStream()
    // two more files land; the restarted stream is KILLED between them
    writeFile("f2", Seq((2L, "a"), (3L, "a"))) // 2 = dup across restart
    writeFile("f3", Seq((3L, "a"), (4L, "a"), (1L, "a")))
    crashAtBatch = 2L // batch ids continue from the checkpoint: 1, then 2
    val e = intercept[Exception](runStream())
    assert(e.getMessage != null) // stream died mid-run (one file unprocessed)
    // resume from the same checkpoint: processes ONLY the remaining file,
    // with the dedup state of every previous run intact
    runStream()
    val out = spark.read.parquet(sink).select("user_id")
      .collect().map(_.getLong(0)).toSeq
    // exactly-once: each user appears once, across three runs and a crash —
    // a lost state store would re-emit users 1/2/3, a replayed batch would
    // duplicate rows
    assert(out.sorted == Seq(1L, 2L, 3L, 4L))
  }

  test("checkpoint resume: stream-stream join state survives restart (q79 shape)") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val root = tmpDir("join_resume")
    val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("kind", StringType)))
    def writeFile(side: String, name: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("user_id", "ts", "kind")
        .select(col("user_id"), col("ts").cast("timestamp"), col("kind"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/$side/$name")
    def stream(side: String) = spark.readStream.schema(schema)
      .parquet(s"$root/$side/*").withWatermark("ts", "2 hours")
    def runStream(): Unit = {
      val clicks = stream("left")
        .select(col("user_id"), col("ts").as("c_ts"))
      val signups = stream("right")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      val joined = clicks.join(signups,
        col("user_id") === col("s_user") &&
          col("s_ts") >= col("c_ts") &&
          col("s_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      val q = joined.writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(sink)
        }
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: only the click arrives; the join buffers it in the state store
    writeFile("left", "f1", Seq((7L, "2024-01-01 10:00:00", "click")))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/right"))
    runStream()
    // batch 0 commits (possibly an empty sink write) but no pair matched yet
    def sinkCount(): Long =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(sink)))
        spark.read.parquet(sink).count()
      else 0L
    assert(sinkCount() == 0L)
    // restart (fresh query object, same checkpoint): the matching signup
    // arrives — the pair can ONLY be emitted if the buffered click was
    // restored from the checkpointed state store
    writeFile("right", "f2", Seq((7L, "2024-01-01 10:20:00", "signup")))
    runStream()
    val out = spark.read.parquet(sink)
      .select("user_id", "c_ts", "s_ts").collect().toSeq
    assert(out.size == 1 && out.head.getLong(0) == 7L)
    // idempotent replay: running again with nothing new emits nothing
    runStream()
    assert(spark.read.parquet(sink).count() == 1)
  }

  test("chunked events dir: q79/q55/q65 streams equal batch over multiple micro-batches") {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    // stage: fixture events split into 3 ts-ordered single-file chunks
    // under <dir>/events.parquet/ — the scaled-corpus layout ScaleBench
    // writes, where each chunk becomes its own micro-batch
    val root = tmpDir("chunked_ev")
    val ev = graft.core.Tables.load(spark, sf001, "events")
    val n = ev.count()
    val evDir = s"$root/events.parquet"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(evDir))
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val chunked = ev.withColumn("__rn", row_number().over(w) - 1)
      .withColumn("__chunk", (col("__rn") * 3 / n).cast("int")).drop("__rn")
    (0 until 3).foreach { k =>
      val tmp = s"$root/__tmp"
      chunked.filter(col("__chunk") === k).drop("__chunk")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(f"$evDir/chunk-$k%03d.parquet"))
    }

    // count DATA micro-batches of the q79 stream via listener (async)
    val joinBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == "q79_stream_join" && e.progress.numInputRows > 0)
          joinBatches.incrementAndGet()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val evB = graft.core.Tables.load(spark, root, "events")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("event_type").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq

      // q79: watermarked stream-stream join — the state-bounding case
      val gotJoin = canon(StreamingReconcile.attributionJoinStream(spark, root))
      val s = evB.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
      val a = evB.filter(col("event_type") =!= "signup")
        .select(col("user_id").as("a_user"), col("event_type").as("a_type"),
          col("ts").as("a_ts"))
      val expJoin = canon(a.join(s,
          col("a_user") === col("s_user") &&
            col("a_ts") >= col("s_ts") &&
            col("a_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("a_type").as("event_type"))
        .agg(count(lit(1)).as("n_attributed")))
      assert(gotJoin.nonEmpty && gotJoin == expJoin)

      // q55: complete-mode windowed aggregate across batches
      val gotAgg = StreamingReconcile.hourlyAggStream(spark, root)
        .orderBy("hour", "event_type").collect().toSeq
      val expAgg = evB
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)").as("sum_value"))
        .orderBy("hour", "event_type").collect().toSeq
      assert(gotAgg.nonEmpty && gotAgg == expAgg)

      // q65: dropDuplicates state carries across batches (first-sight emit)
      val gotDedup = canon(StreamingReconcile.dedupStream(spark, root))
      val expDedup = canon(evB.select("user_id", "event_type").distinct()
        .groupBy("event_type").agg(count(lit(1)).as("n_users")))
      assert(gotDedup.nonEmpty && gotDedup == expDedup)

      // the join really ran file-per-trigger: 3 chunks → >= 3 data batches
      var waited = 0
      while (joinBatches.get < 3 && waited < 100) { Thread.sleep(50); waited += 1 }
      assert(joinBatches.get >= 3,
        s"expected >= 3 data micro-batches for the chunked source, saw ${joinBatches.get}")
    } finally spark.streams.removeListener(listener)
  }

  test("mapGroupsWithState sessionization matches the batch window form") {
    val events = graft.core.Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[StreamingReconcile.Event]
    val got = StreamingReconcile.sessionize(events)
      .orderBy("user_id").collect()
      .map(u => (u.user_id, u.n_sessions, u.n_events)).toSeq
    // batch oracle: q46 logic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gap = unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w))
    val expected = events.toDF()
      .withColumn("new_s", when(gap.isNull || gap > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("new_s").as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("scd2Runs fold: runs close on change, open run stays in state, versions ordinal") {
    // batch execution of the flatMapGroupsWithState fold (single
    // invocation per group, empty initial state): pure fold-logic check
    val evs = Seq(
      StreamingReconcile.Scd2Ev(1L, 100L, "a", 1L),
      StreamingReconcile.Scd2Ev(1L, 200L, "a", 2L),
      StreamingReconcile.Scd2Ev(1L, 300L, "b", 3L),
      StreamingReconcile.Scd2Ev(1L, 400L, "c", 4L), // c stays OPEN
      StreamingReconcile.Scd2Ev(2L, 150L, "x", 5L)  // single run, open
    ).toDS()
    val closed = StreamingReconcile.scd2Runs(evs)
      .collect().sortBy(c => (c.user_id, c.version))
      .map(c => (c.user_id, c.version, c.event_type, c.from_us, c.to_us, c.n_events))
    assert(closed.toSeq == Seq(
      (1L, 1L, "a", 100L, 300L, 2L),
      (1L, 2L, "b", 300L, 400L, 1L)))
  }

  test("streaming SCD2 equals the batch operator's closed intervals") {
    val got = StreamingReconcile.scd2Stream(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val expected = graft.operators.Scd2.history(
      graft.core.Tables.load(spark, sf001, "events"),
      "user_id", "ts", "event_type", "event_id")
      .filter(col("valid_to").isNotNull)
      .orderBy("user_id", "version")
      .collect().map(_.toSeq).toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("streaming rollup equals the batch rollup regardless of micro-batching") {
    import org.apache.spark.sql.functions._
    val events = graft.core.Tables.load(spark, sf001, "events")
    val batch = events
      .groupBy(col("event_type"), to_date(col("ts")).as("event_day"))
      .agg(count(lit(1)).as("n"),
        sum(graft.agg.AggStore.micros(col("value").cast("double"))).as("sum_micros"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "event_day", "n", "sum_micros", "min_v", "max_v")
        .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5))).toSet
    val streamed = StreamingReconcile.rollupStream(spark, sf001)
    assert(sig(streamed) == sig(batch))
    // rerun-stable: a second full stream run lands on the same answer
    assert(sig(StreamingReconcile.rollupStream(spark, sf001)) == sig(batch))
  }

  test("streamed sketch/map rollup states match a batch-built store") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ev = graft.core.Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
    val scratch = tmpDir("stream_rollup_states")
    val sm = Seq(("by_user",
      col("user_id").cast("string"), col("value")))
    // batch store: one shard holding everything
    val batchStore = s"$scratch/batch"
    graft.agg.AggStore.append(spark, batchStore, ev, Seq("event_type"),
      "value", "all", distinctCol = "user_id", quantileCol = "value",
      sumMap = sm)
    // streamed store: two micro-batches folding per-batch states
    val inDir = s"$scratch/in"
    ev.repartition(2).write.mode("overwrite").parquet(inDir)
    val streamStore = s"$scratch/stream"
    val q = spark.readStream.schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .writeStream.option("checkpointLocation", s"$scratch/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.agg.AggStore.append(b.sparkSession, streamStore, b,
          Seq("event_type"), "value", s"batch_$id",
          distinctCol = "user_id", quantileCol = "value", sumMap = sm)
      }
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def read(p: String) = graft.agg.AggStore.merged(spark, p)
    val b = read(batchStore).collect().map(r => r.getString(0) -> r).toMap
    val s = read(streamStore).collect().map(r => r.getString(0) -> r).toMap
    assert(b.keySet == s.keySet && b.nonEmpty)
    val raw = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    b.keySet.foreach { k =>
      // exact states and the key-wise map are partitioning-independent
      assert(b(k).getAs[Long]("n") == s(k).getAs[Long]("n"))
      assert(b(k).getAs[Long]("sum_micros") == s(k).getAs[Long]("sum_micros"))
      assert(b(k).getAs[Map[String, Long]]("by_user_summap") ==
        s(k).getAs[Map[String, Long]]("by_user_summap"))
      // HLL registers fold by max — the union is order-insensitive, so
      // the streamed estimate is bit-equal to the batch one
      assert(b(k).getAs[Long]("n_distinct_est") == s(k).getAs[Long]("n_distinct_est"))
      // GK summaries ARE order-sensitive; both paths honour the rank
      // bound, which is the contract (q164's gate)
      val xs = raw(k)
      Seq(b(k), s(k)).foreach { row =>
        val est = row.getAs[Double]("q_p50")
        val target = math.ceil(0.5 * xs.length)
        val slack = 1e-4 * xs.length + 2
        assert(xs.count(_ < est) + 1 <= target + slack &&
          xs.count(_ <= est) >= target - slack)
      }
    }
  }
}
