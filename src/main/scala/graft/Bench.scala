package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Round benchmark: one JSON line against the BASELINE.md targets.
  *
  *  - every SparkEntry query timed end-to-end (physical plan fully
  *    materialized via toRdd — count() would let Catalyst prune the
  *    projected columns and under-measure projection-heavy queries);
  *  - batch copy throughput (parquet → emit → ES-sim bulk sink);
  *  - streaming micro-batch latency through the DSv2 source at 10k
  *    docs/batch, 1 s trigger.
  *
  * A warmup pass absorbs JIT/codegen/first-scan costs so the timings
  * reflect steady state, which is what the 100 TB design cares about.
  */
object Bench {

  private def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()

  import BenchUtil.{timeSec, rmTree}

  /** Steady-state protocol for the single-shot probes (skew / composed
    * pipeline / streaming curation): the same GC-settle + min-of-2 the
    * per-query timings get. Round 7's skew_* rows were not comparable to
    * round 6 (skew_graph 2.2→26.7 s on unchanged probe code) because 250
    * query executions now precede the probes and each probe was a SINGLE
    * sample — whatever cleaner/GC debt the suite queued was billed to the
    * first probe that ran. Settling before each attempt and taking the
    * min of two removes the context dependency, making skew_* rows
    * round-over-round comparable again.
    */
  private def probeSec(body: => Unit): Double = {
    def attempt(): Double = {
      Scratch.drain() // prior attempt's tracked checkpoints are dead
      System.gc(); Thread.sleep(1000)
      timeSec(body)
    }
    math.min(attempt(), attempt())
  }

  /** The copy workload, shared verbatim by the in-suite section and
    * [[CopyBench]]'s isolated fresh-JVM run (round-14: two data points
    * separate the copy PATH from the suite/box CONTEXT): events ∪
    * lineitem → IngestRecord, cursor riding as a typed column,
    * store written cursor-clustered. */
  private[graft] def copyRecords(spark: SparkSession, sfDir: String,
      cpus: Int): org.apache.spark.sql.Dataset[ingest.IngestRecord] = {
    import spark.implicits._
    // same emitted body as Emit.ing01EmitEvents / the r9 lineitem lane
    val ev = Tables.events(spark, sfDir).select(
      lit("events").as("indexId"),
      $"event_id".cast("string").as("docId"),
      to_json(struct($"event_id", $"event_type", $"value",
        $"ts".cast("string").as("ts"),
        get_json_object($"props", "$.k").cast("int").as("k"))).as("source"),
      $"ts".cast("string").as("sort_ts"))
    val li = Tables.lineitem(spark, sfDir).select(
      lit("lineitem").as("indexId"),
      concat_ws("-", $"l_orderkey", $"l_linenumber").as("docId"),
      to_json(struct($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_linenumber",
        $"l_quantity", $"l_extendedprice",
        $"l_shipdate".cast("string").as("ts"))).as("source"),
      $"l_shipdate".cast("string").as("sort_ts"))
    ev.unionByName(li)
      .repartitionByRange(cpus, $"sort_ts")
      .sortWithinPartitions($"sort_ts")
      .select($"indexId", $"docId", $"source")
      .as[ingest.IngestRecord]
  }

  /** The streaming-admission workload, shared verbatim by the in-suite
    * section and [[StreamBench]]'s isolated fresh-JVM run (the
    * copyRecords discipline): the sf corpus in 5 id-range batches
    * through the persisted-lane near-dup admission loop. */
  private[graft] def streamAdmitBatches(docs: org.apache.spark.sql.DataFrame,
      dir: String, lo: Long, hi: Long): Unit = {
    val s = docs.sparkSession
    import s.implicits._
    val bounds = (0 to 5).map(i => lo + (hi - lo + 1) * i / 5)
    (0 until 5).foreach { i =>
      streaming.StreamingCuration.admitBatch(
        docs.filter($"doc_id" >= bounds(i) && $"doc_id" < bounds(i + 1)),
        dir, 0.8, i.toLong)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the environment provides 32 executor threads (local[32]); honor an
    // explicit override but never default below the machine's shape
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    // isolated fresh-JVM brackets FIRST, with nothing else running
    // (round-14: the in-suite copy number slid three rounds on an
    // untouched path; two data points separate the PATH from the
    // suite/box CONTEXT — see CopyBench. Round-17 gives the streaming
    // admission leg the same treatment: r16's curation_stream_s
    // doubled with only a schema-fallback fix in the path, and nobody
    // could tell context from regression — see StreamBench). Both run
    // before this JVM allocates its SparkSession so each child sees a
    // quiet box.
    def forkIsolated(mainClass: String, metric: String): String = try {
      val jvm = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
      // same module opens Spark 4 needs outside spark-submit (build.sbt)
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq(jvm) ++ addOpens ++ Seq(
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-cp", sys.props("java.class.path"), mainClass)
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      // drain stderr (Spark logs) so the child never blocks on a full pipe
      val drain = new Thread(() => {
        val es = proc.getErrorStream
        val buf = new Array[Byte](8192)
        while (es.read(buf) >= 0) ()
      })
      drain.setDaemon(true); drain.start()
      // read stdout on a daemon thread too: a blocking getLines() HERE
      // would wait forever on a child that hangs without closing its
      // stdout, so the 600 s waitFor below would never be reached —
      // capture asynchronously, then waitFor with timeout and kill
      val outHolder = new java.util.concurrent.atomic.AtomicReference[String](null)
      val outDrain = new Thread(() => {
        try {
          val lines = scala.io.Source.fromInputStream(proc.getInputStream)
            .getLines()
          lines.find(_.startsWith(s"""{"metric":"$metric""""))
            .foreach(outHolder.set)
          // keep draining to EOF: if the child writes more after the
          // match and we stop reading, its stdout pipe fills and it
          // blocks on write — turning every run into the full 600 s
          // waitFor timeout even though the result is already captured
          while (lines.hasNext) lines.next()
        } catch { case _: Throwable => () }
      })
      outDrain.setDaemon(true); outDrain.start()
      if (!proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS))
        proc.destroyForcibly()
      outDrain.join(5000)
      Option(outHolder.get())
        .getOrElse(s"""{"metric":"$metric","error":"no output"}""")
    } catch {
      case e: Throwable =>
        s"""{"metric":"$metric","error":"${e.getClass.getSimpleName}"}"""
    }
    val isolatedLine = forkIsolated("graft.CopyBench", "copy_isolated")
    val streamIsolatedLine = forkIsolated("graft.StreamBench", "stream_isolated")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // names are interpolated into the JSON artifact lines unescaped —
    // keep that safe by construction (round-11 advice)
    require(queries.forall(_._1.matches("[A-Za-z0-9_]+")),
      "query names must be JSON-safe identifiers")

    // warmup: once through everything (codegen compile, parquet footer
    // cache, JIT); timings below are the second, steady-state run
    queries.foreach { case (_, fn) =>
      try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
    }

    // let the async ContextCleaner drain the warmup pass's broadcast /
    // codegen debt before anything is timed: the first timed query was
    // measured absorbing up to 3× its isolated median as the suite grew
    Scratch.drain() // the warmup pass's tracked checkpoint scratch too
    System.gc()
    Thread.sleep(3000)

    // batch copy throughput: events ∪ lineitem → IngestRecord → bulk sink.
    // Every doc carries the cursor field (events' ts, lineitem's
    // l_shipdate) and the store is written CURSOR-CLUSTERED
    // (range-partition + sort on ts) — the layout a real incremental
    // store has by construction (files arrive in time order under the
    // sink's monotonic wall-clock naming).
    // POSITION (round-13): this section runs HERE — after the warmup
    // pass, before the timed query suite — because its number drifted
    // with the SUITE, not the code: r11→r12 it fell 138.7k → 116.6k
    // docs/s on an untouched path with tight attempt spreads, exactly
    // as 19 queries were added upstream of it; per-attempt settles
    // can drain queued GC but not the larger old-gen occupancy a
    // 177-query pass leaves behind. Measured after warmup only, the
    // number tracks the copy path, not the suite's growth.
    // Measurement protocol (round-10 fix — BENCH_r09 reported 4.3k
    // docs/s on code that does 52k in isolation):
    //  - SETTLE before each attempt (System.gc + 2 s).
    //  - MEDIAN-OF-3, each attempt on a FRESH lineage (the Dataset is
    //    rebuilt per attempt): r9's single timed write reused the
    //    shuffle map output of the nDocs count() on the same Dataset,
    //    so copy_sec measured sort+write, not the full copy. Each
    //    attempt here pays scan + range-shuffle + sort + write.
    //  - the cursor rides as a TYPED column selected before to_json
    //    (events' ts, lineitem's l_shipdate) and is dropped at the sink
    //    boundary — not re-parsed per row out of the serialized body.
    import spark.implicits._
    def mkCopyRecords() = copyRecords(spark, sfDir, cpus.toInt)
    // row count from metadata-only scans — does NOT warm the copy shuffle
    val nDocs = Tables.events(spark, sfDir).count() +
      Tables.lineitem(spark, sfDir).count()
    // protocol symmetry with CopyBench (r14 verdict #3): one unrecorded
    // warmup write so both measurements start from the same warmed
    // sink/codegen state — the isolated fork had this, the in-suite
    // attempts didn't, which left a protocol asymmetry inside the
    // path-vs-context bracket the two numbers exist to form
    locally {
      val warmDir = java.nio.file.Files.createTempDirectory("graft-bench-copywarm").toString
      ingest.EsBulkSink.write(mkCopyRecords(), warmDir)
      rmTree(warmDir)
    }
    val copyAttempts = (1 to 3).map { i =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-bench-sink$i").toString
      System.gc(); Thread.sleep(2000)
      dir -> timeSec(ingest.EsBulkSink.write(mkCopyRecords(), dir))
    }
    val copySec = copyAttempts.map(_._2).sorted.apply(1)
    // the streaming drain below reads the LAST attempt's store
    val copyDir = copyAttempts.last._1
    copyAttempts.dropRight(1).foreach { case (d, _) => rmTree(d) }
    val copyDocsPerS = nDocs / copySec

    // drain the copy section's debt before the timed suite starts
    System.gc()
    Thread.sleep(2000)

    // streaming micro-batch latency: drain the store the copy section
    // just wrote, HERE in the same pre-suite quiet zone (round 13: when
    // the drain ran after the grown query suite its median batch tripled
    // on unchanged code — page-cache/JIT context, not the source; the
    // two sections measure one store and belong together). Store layout
    // is cursor-clustered — the previous unsorted bulk copy produced files
    // whose ts ranges all overlapped and 600k docs with NO ts at all;
    // the drain then degenerated to one 597k-row first batch and each
    // later micro-batch re-parsing ~the whole corpus. That measured
    // file-layout pathology, not micro-batch latency; the
    // stream_files_opened telemetry keeps read amplification observable
    // so the pathology can never hide again) through
    // the DSv2 source at 10k docs/batch and take the median batch time.
    // Settle GC/compilation debt from the sections above first, and
    // exclude the first two (warmup) batches from the median.
    System.gc()
    Thread.sleep(2000)
    // the sink above wrote stats sidecars; the source's planning index
    // must be a pure metadata read — any body parse here is a regression
    val parsedBefore = sources.EsSimStats.filesParsed.get()
    // read amplification: bulk-file opens across the whole drain vs the
    // store's file count — a cursor-clustered store drains at ~1× (each
    // file read about once, plus boundary straddlers); overlapping
    // ranges would send this toward batches × files
    val bulkFilesInStore = sources.EsSimStats.list(copyDir).size
    sources.EsSimSource.filesOpened.set(0)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-ckpt").toString
    val q = spark.readStream
      .format("graft.sources.EsSimSourceProvider")
      .option("path", copyDir).option("tsField", "ts").option("batchSize", "10000")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(1000))
      .foreachBatch { (b: DataFrame, _: Long) => b.queryExecution.toRdd.count(); () }
      .start()
    val deadline = System.currentTimeMillis() + 60000
    while (System.currentTimeMillis() < deadline &&
           q.recentProgress.count(_.numInputRows > 0) < 10)
      Thread.sleep(500)
    q.stop()
    val trigMs = q.recentProgress.filter(_.numInputRows > 0)
      .map(_.durationMs.getOrDefault("triggerExecution", 0L).toDouble)
      .drop(2) // warmup batches carry codegen/classload cost
    val streamingBatchMs =
      if (trigMs.nonEmpty) trigMs.sorted.apply(trigMs.length / 2) else -1.0
    val streamFilesParsed = sources.EsSimStats.filesParsed.get() - parsedBefore
    val streamFilesOpened = sources.EsSimSource.filesOpened.get()

    // drain the streaming section's debt before the timed suite starts
    System.gc()
    Thread.sleep(2000)


    // context-health telemetry (the r8 lesson: a whole bench run
    // executed in a degraded environment — copy −2.5×, streaming +7× on
    // unchanged code — and nothing in the artifact showed it). Record
    // JVM GC time per query and block-manager storage so a degraded run
    // is visible IN the numbers: healthy steady state is gc_ms a few %
    // of wall and storage flat; climbing storage or gc >> wall says the
    // timings are context, not code.
    def gcMsNow(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def storageNow(): (Int, Long) = {
      val infos = spark.sparkContext.getRDDStorageInfo
      (infos.length, infos.map(_.memSize).sum)
    }
    val gcStart = gcMsNow()

    // mid-suite resource telemetry (r18, VERDICT r17 #3): the in-suite
    // vs isolated delta survived the r17 scratch fix with storage
    // clean, so sample the OTHER candidate resources at ~5 points
    // through the 200+-query run — JIT compilation time and code-cache
    // occupancy (the RampProbe finding: large generated plans keep the
    // C2 compiler busy deep into the suite), metaspace (classloading
    // from 200 distinct generated plans), and shuffle/block files on
    // disk (page-cache pressure proxy). Emitted as
    // suite_context_samples in bench_detail.json so the attribution is
    // in the committed artifact, not a one-off probe session.
    def jitMsNow(): Long =
      Option(java.lang.management.ManagementFactory.getCompilationMXBean)
        .filter(_.isCompilationTimeMonitoringSupported)
        .map(_.getTotalCompilationTime).getOrElse(-1L)
    def poolUsedMb(prefix: String): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getName.startsWith(prefix))
        .map(_.getUsage.getUsed).sum / (1024 * 1024)
    }
    // this JVM is the box's main Spark tenant while the bench runs, so
    // counting every blockmgr-* under the tmp root tracks its own
    // shuffle-file debt (stale dirs from crashed runs would show as a
    // high flat baseline, not growth — growth is the signal)
    def blockmgrFiles(): Long = {
      val tmp = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir", "/tmp"))
      var n = 0L
      try {
        val st = java.nio.file.Files.list(tmp)
        try st.forEach { p =>
          if (p.getFileName.toString.startsWith("blockmgr-")) {
            val w = java.nio.file.Files.walk(p)
            try w.forEach(q =>
              if (java.nio.file.Files.isRegularFile(q)) n += 1)
            finally w.close()
          }
        } finally st.close()
      } catch { case _: Throwable => () }
      n
    }
    val ctxSamples = scala.collection.mutable.ArrayBuffer[String]()
    def sampleContext(after: String, seq: Int): Unit = {
      val (rd, mem) = storageNow()
      ctxSamples += s"""{"after":"$after","seq":$seq,""" +
        s""""gc_ms":${gcMsNow()},"jit_ms":${jitMsNow()},""" +
        s""""codecache_mb":${poolUsedMb("CodeHeap")},""" +
        s""""metaspace_mb":${poolUsedMb("Metaspace")},""" +
        s""""storage_rdds":$rd,"storage_mem_mb":${mem / (1024 * 1024)},""" +
        s""""blockmgr_files":${blockmgrFiles()},""" +
        s""""scratch_live":${Scratch.liveCount}}"""
    }
    sampleContext("suite_start", -1)

    // peak block-manager debt ACROSS the run, not just end-of-run
    // residue: r10's d08/s11 watch item showed end-of-run storage can
    // read clean (1 RDD) while mid-suite debt inflates neighbors — the
    // peak makes that observable in the artifact (sampled after each
    // query; an intra-query spike can still slip between samples).
    // RDD-count and byte maxima are tracked independently (round-11
    // advice): the bounded-storage property SCALE.md cites is about
    // RDD count, and a many-small-RDDs sample must not hide behind a
    // fewer-bigger-RDDs one
    var peakRdds = 0
    var peakMem = 0L
    var peakAfter = ""
    // the multi-job iterative-CC / triangle-family queries swing up to
    // ±2.5× run-to-run under min-of-2 (r10/r11: s11 timed 2.45 s in one
    // run and 6.08 s in another on identical code; d12/s10/d14/s07
    // swung 1.3–1.9×) — each CC round is its own job, so these queries
    // sample the scheduler/JIT/GC state ~10× per execution and two
    // in-lineage samples share whatever debt the suite queued. Apply
    // the copy section's protocol — settle before EACH attempt,
    // median-of-3, every attempt a fresh lineage — and publish the
    // attempt spreads, so the artifact itself distinguishes run-to-run
    // variance from a real regression
    val ccFamily = Set("d08_dedup_clusters", "d12_collapsed_clusters",
      "s07_knn_graph", "s10_ivf_knn", "s11_semantic_survivors",
      "d14_containment",
      // r13 additions run CC too (multi-job, same variance profile)
      "m11_perceptual_clusters", "s23_semdedup",
      // r14: s23's collapsed production twin — same CC stage
      "s26_semdedup_collapsed",
      // r15: d23 rides d08's CC — same multi-job variance profile
      "d23_cluster_mass",
      // r16: both run CC (d25 twice: standing build + projected merge;
      // d27 twice: map build + affected re-label) — same profile
      "d25_incremental_clusters", "d27_cluster_delete",
      // r18: the remaining artifact-WRITING registered entries join the
      // settled protocol — each invocation builds a full temp index
      // (many write jobs), the class whose r17 isolated brackets swung
      // 2–4× on shared-box write-path noise; a settled median official
      // number makes the in-suite and isolated frames comparable
      "u01_lsh_update_probe", "t41_bm25_persisted", "s27_ivfadc_persisted",
      "s17_ivf_persisted", "d21_lsh_index_probe", "d26_lsh_delete_probe",
      "m10_payload_index_probe", "m18_payload_delete_probe",
      "u02_corpus_sync_probe", "u03_cluster_sync_map",
      // r15: c12 — not CC, but the same many-jobs profile (state write
      // + multi-stage admission): its OFFICIAL number rose three rounds
      // (4.21 → 5.31 → 6.20 s) while its isolated bracket sat flat at
      // ~5.3, i.e. the suite's warm min-of-2 was billing suite context
      // to the p100 headline. The settled median-of-3 is the protocol
      // built for exactly that (r14 verdict #2).
      "c12_incremental_curation")
    val ccAttempts = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val ctxStep = math.max(1, queries.size / 5)
    val results = queries.zipWithIndex.map { case ((name, fn), qi) =>
      // settle GC debt from the previous query so its collection pause
      // is not billed to this one (the LSH joins allocate heavily) —
      // and deterministically release the PREVIOUS query's tracked
      // checkpoint scratch first (r17: leaked localCheckpoint blocks
      // were the r16 suite-wide "context" inflation — storage_rdds
      // grew 1 → 4 across the run and every query paid for it)
      Scratch.drain()
      System.gc()
      val gc0 = gcMsNow()
      // min of two runs: a single sample still carries whatever cleanup
      // the previous query queued; the min is the steady-state estimate
      // (PerfProbe medians agree with it, single samples can be 3× off)
      // per-attempt settle GC must NOT bill into this query's gc share
      // (it collects whatever the SUITE queued): accumulate only the
      // deltas of the timed spans themselves
      var settleGcMs = 0L
      val sec = try {
        if (ccFamily(name)) {
          val ts = (1 to 3).map { _ =>
            val s0 = gcMsNow()
            Scratch.drain() // fresh lineage = fresh scratch too
            System.gc(); Thread.sleep(1000)
            settleGcMs += gcMsNow() - s0
            timeSec(materialize(fn(spark, sfDir)))
          }
          ccAttempts(name) = ts
          // settled median-of-3, uniformly. r16 special-cased c12 with
          // a MIN estimator on a "self-degrading ramp" read; the r17
          // RampProbe telemetry (DRIFT.md addendum) showed no resource
          // grows across 8 settled attempts and the ramp DECLINES to a
          // flat floor once scratch is drained — the r16 rise was JIT
          // warmup + box noise, so the special case is deleted and the
          // attempt spreads stay published for audit.
          ts.sorted.apply(1)
        } else {
          val t1 = timeSec(materialize(fn(spark, sfDir)))
          val t2 = timeSec(materialize(fn(spark, sfDir)))
          math.min(t1, t2)
        }
      } catch { case _: Throwable => -1.0 }
      val (nowRdds, nowMem) = storageNow()
      if (nowMem > peakMem) { peakMem = nowMem; peakAfter = name }
      if (nowRdds > peakRdds) peakRdds = nowRdds
      if ((qi + 1) % ctxStep == 0 || qi == queries.size - 1)
        sampleContext(name, qi)
      // GC across the timed runs (not the settles): the per-query share
      // of collector time — attribution for any inflated sample
      (name, sec, gcMsNow() - gc0 - settleGcMs)
    }
    val gcQueriesMs = gcMsNow() - gcStart
    // drain before sampling the END-STATE storage metric: the last
    // query's tracked scratch is by-design alive until a consumer
    // drain, and counting it would make a healthy run read as a leak
    Scratch.drain()
    val (storageRdds, storageMem) = storageNow()
    val ok = results.filter(_._2 >= 0).map(_._2).sorted
    val medianS = if (ok.nonEmpty) ok(ok.size / 2) else -1.0
    val p100S = if (ok.nonEmpty) ok.last else -1.0

    // suite-context attribution, IN the artifact: the round-12 diff
    // showed +11 s of diffuse drift across untouched queries
    // (GC-pressure-correlated) with no way to tell, per query, how much
    // was the query and how much the measurement context. After the
    // whole suite has run, re-measure the 10 slowest under the CC
    // protocol (settle + median-of-3, fresh lineage each). READ THE TWO
    // NUMBERS AS A BRACKET, not a subtraction: per_query_s is a warm
    // min-of-2 (back-to-back repetition — page cache, JIT, allocator
    // all hot) and isolated_top10_s is a settled median (each attempt
    // pays re-entry), so isolated usually reads HIGHER (r13 official:
    // 1.1–2.6× across the top-10). The steady-state truth lies between;
    // a cross-round move of per_query_s that isolated_top10_s does NOT
    // mirror is measurement context, and one that both mirror is code.
    // round-over-round self-attribution (r14): the previous round's
    // committed bench_detail.json is the baseline — every query that
    // regressed > 1.3× and > 0.3 s against it joins the isolation set,
    // so the artifact itself answers "context or code?" for exactly
    // the queries the cross-round diff will flag, not just the tail.
    val prevPerQuery: Map[String, Double] = try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("bench_detail.json")), "UTF-8")
      val body = txt.split("\"per_query_s\":\\{", 2)(1).split("\\}", 2)(0)
      body.split(",").flatMap { kv =>
        kv.split(":") match {
          case Array(k, v) => Some(k.replace("\"", "") -> v.toDouble)
          case _ => None
        }
      }.toMap
    } catch { case _: Throwable => Map.empty }
    val nowByName = results.map { case (k, v, _) => k -> v }.toMap
    val regressed = results.filter(_._2 >= 0).collect {
      case (name, sec, _)
          if prevPerQuery.get(name).exists(p => sec > p * 1.3 && sec - p > 0.3) =>
        name
    }
    // r18 (VERDICT r17 #1): every isolated bracket runs the FULL
    // copy_isolated discipline — one unrecorded WARMUP execution
    // (re-entry pays codegen/JIT/footer-cache that the steady state
    // does not; the cc-family attempt arrays show attempt 1
    // consistently highest), then settle + median-of-3 with the
    // per-attempt Scratch.drain() moving deferred temp-index
    // deletions off the timed span — and the ATTEMPTS are published
    // (isolated_attempts_s in bench_detail.json), so a shared-box
    // write-path spike is visible as a one-attempt outlier instead of
    // silently becoming the gate reading (r17: d27 isolated read
    // 19.05 s in the driver run vs 4.95 in-suite on unchanged code).
    val isolatedAttempts = {
      val fnByName = queries.toMap
      val names = (results.filter(_._2 >= 0).sortBy(-_._2).take(10).map(_._1)
        ++ regressed).distinct
      names.map { name =>
        val fn = fnByName(name)
        Scratch.drain()
        try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
        val ts = (1 to 3).map { _ =>
          Scratch.drain()
          System.gc(); Thread.sleep(1000)
          timeSec(materialize(fn(spark, sfDir)))
        }
        name -> ts
      }
    }
    val isolatedTop10 = isolatedAttempts.map { case (n, ts) =>
      n -> ts.sorted.apply(1)
    }
    // the regression verdict, computed in-artifact: a regression whose
    // ISOLATED time also moved ≥ 1.3× vs last round's per_query_s is
    // code; one whose isolated time sits at ~the old warm number is
    // measurement context
    val regressionJson = regressed.map { name =>
      val prev = prevPerQuery(name)
      val iso = isolatedTop10.toMap.getOrElse(name, -1.0)
      val verdict = if (iso >= 0 && iso <= prev * 1.3) "context" else "code-or-unknown"
      s""""$name":{"prev_s":$prev,"now_s":${nowByName(name)},""" +
        s""""isolated_s":$iso,"read":"$verdict"}"""
    }.mkString("{", ",", "}")

    // skew stress (round-5 carried item): 1200 copies of one boilerplate
    // doc on top of the sf corpus — the d04 maxBucket guard must keep
    // candidate generation bounded, and the exact d03 prefix join must
    // complete carrying the full quadratic truth (~720k boiler pairs)
    System.gc()
    import operators.Dedup
    val boiler = "all rights reserved " +
      Seq.tabulate(30)(i => s"w${i % 11}").mkString(" ")
    val skewDocs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .unionByName(spark.range(1200)
        .select(($"id" + 10000000L).as("doc_id"), lit(boiler).as("text")))
    val skewSh = skewDocs
      .select($"doc_id", Dedup.shingleHashes($"text").as("sh"))
      .filter(size($"sh") > 0)
    val skewBanded = skewSh
      .select($"doc_id", posexplode(Dedup.bandKeys(Dedup.minhashSignature($"sh"))))
      .toDF("doc_id", "band_id", "band_hash")
    var skewLshCands = 0L
    val skewLshSec = probeSec { skewLshCands = Dedup.lshCandidates(skewBanded).count() }
    var skewD03Pairs = 0L
    val skewD03Sec = probeSec { skewD03Pairs = Dedup.ngramJaccardPairs(skewDocs, 0.8).count() }
    // same corpus, d10 collapse pre-pass: identical pair count, but the
    // join sees each distinct shingle set once — the 1200-dup boilerplate
    // costs one join row, and only the O(m²) OUTPUT expansion remains
    var skewD10Pairs = 0L
    val skewD10Sec = probeSec {
      skewD10Pairs = Dedup.ngramJaccardPairsViaCollapse(skewDocs, 0.8).count()
    }
    // the cluster-path form a real pipeline uses: star edges instead of
    // the within-group clique — O(m) edges, no quadratic anything
    var skewGraphEdges = 0L
    val skewGraphSec = probeSec {
      skewGraphEdges = Dedup.collapsedPairGraph(skewDocs, 0.8).count()
    }
    // end-to-end clusters via rep-level CC: label propagation iterates
    // one node per DISTINCT shingle set — the 1200-dup boiler group is
    // a single node per round, members attach with one final join
    var skewClusterRows = 0L
    val skewClustersSec = probeSec {
      skewClusterRows = Dedup.collapsedClusters(skewDocs, 0.8).count()
    }
    // payload-modality storm (round-14): the same 1200-dup boilerplate
    // as BINARY payloads through m12's CDC chunk join — the byte-exact
    // collapse guard must keep the inverted-index join at one row per
    // distinct payload while the expanded answer carries the full
    // ~719k-pair clique
    var skewPayloadPairs = 0L
    val skewPayloadSec = probeSec {
      skewPayloadPairs = operators.Multimodal.cdcNearDupPairs(
        skewDocs.select($"doc_id", encode($"text", "utf-8").as("payload")),
        0.5).count()
    }

    // streaming near-dup admission over the sf corpus in 5 batches:
    // each batch probes the persisted standing LSH lanes (r15 — the
    // delta-cost path: standing banded lane streams past the broadcast
    // batch, nothing standing re-derived per batch). NOTE on reading
    // this number across rounds: r14's 4.3 s measured the old
    // full-history prefix-join path, whose per-batch cost is ∝ the
    // standing corpus (the wrong curve — O(B·corpus) cumulative); the
    // r15 path pays a higher fixed per-batch orchestration cost at
    // this toy batch size but is measured FLAT in standing size
    // (AdmissionProbe: late/early 1.13 across ~6× growth), which is
    // the property a continuous curation loop actually needs.
    val curDocs = Tables.documents(spark, sfDir).select($"doc_id", $"text").cache()
    val curN = curDocs.count()
    var curAdmitted = 0L
    var curFiles = 0L
    // slice bounds from the actual id range, not row count: sparse or
    // offset doc_ids would silently fall outside count-based bounds
    val (curLo, curHi) = {
      val r = curDocs.agg(min($"doc_id"), max($"doc_id")).head
      (r.getLong(0), r.getLong(1))
    }
    // admitBatch is stateful (each batch delta-joins the history the
    // previous ones wrote), so each steady-state attempt gets a FRESH
    // state dir — min-of-2 over identical end-to-end runs
    def curAttempt(): Double = {
      val dir = java.nio.file.Files.createTempDirectory("bench-cur").toString
      System.gc(); Thread.sleep(1000)
      val s = timeSec {
        streamAdmitBatches(curDocs, dir, curLo, curHi)
        curAdmitted = streaming.StreamingCuration.admittedDocs(spark, dir).count()
      }
      curFiles = streaming.StreamingHistory.dataFileCount(dir)
      rmTree(dir)
      s
    }
    val curSec = math.min(curAttempt(), curAttempt())
    curDocs.unpersist()

    // composed pipeline: materialize the d03 pair join ONCE and feed
    // clusters (d08) + cross-modal QA (d09) from it — the form a real
    // curation run uses. Compare against the d08+d09 standalone query
    // timings above, each of which recomputes the join internally.
    val pipelineSec = probeSec {
      val pairs = Dedup.ngramJaccardPairs(
        Tables.documents(spark, sfDir).select($"doc_id", $"text"), 0.8).cache()
      try {
        pairs.count() // the one materialization of the expensive join
        materialize(Dedup.d08DedupClusters(spark, sfDir, Some(pairs)))
        materialize(operators.Curation.d09CrossModal(spark, sfDir, Some(pairs)))
        materialize(operators.Curation.d13SourceOverlap(spark, sfDir, Some(pairs)))
      } finally pairs.unpersist()
    }

    // c05 shared-frame form (r9 carried item): once the pipeline has
    // materialized the pair frame, the leakage-safe split costs CC over
    // the pairs + one left join — the economics a real curation run
    // gets, vs the registered c05 which must stay self-contained for
    // its DuckDB oracle and so recomputes the corpus pair join.
    val c05SharedSec = {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val pairs = Dedup.ngramJaccardPairs(docs, 0.8).cache()
      try {
        pairs.count() // the pipeline's materialization, not this probe's
        probeSec {
          materialize(operators.Curation.leakageSafeSplit(docs, pairs))
        }
      } finally pairs.unpersist()
    }

    // c12 steady state: admission against SAVED state (what production
    // re-runs per delta) — the registered c12 entry instead builds the
    // state in-plan to stay oracle-self-contained, so its per-query time
    // is state-build + admission; this probe is the operating cost
    val c12AdmitSec = {
      val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      val maxId = docs.agg(max($"doc_id")).head().getLong(0)
      val boundary = 20L.max(maxId - (maxId - 19L) / 5L)
      val bench = docs.filter($"doc_id" < 20)
      val stateDir =
        java.nio.file.Files.createTempDirectory("graft-bench-c12-state").toString
      operators.Curation.curationState(
          docs.filter($"doc_id" >= 20 && $"doc_id" < boundary), bench)
        .write.mode("overwrite").parquet(stateDir)
      val state = spark.read.parquet(stateDir)
      val sec = probeSec {
        materialize(operators.Curation.admitDelta(
          state, docs.filter($"doc_id" >= boundary), bench))
      }
      rmTree(stateDir)
      sec
    }

    // s17 steady state: serve top-k against a PRE-BUILT persisted IVF
    // index (what production pays per query run) — the registered s17
    // entry instead writes the index in-plan to stay oracle-self-
    // contained, so its per-query time is index-build + serve; this
    // probe is the operating cost (the c12_admission_s precedent)
    val s17ServeSec = {
      val emb = Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      val cen = operators.Similarity.trainedCentroids(spark, sfDir, k = 5, iters = 2)
      val idxDir = java.nio.file.Files.createTempDirectory("graft-bench-s17").toString
      operators.Similarity.writeIvfIndex(emb, cen, idxDir)
      val q = emb.withColumn("nrm", operators.Similarity.norm($"v"))
        .filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
      val sec = probeSec {
        materialize(operators.Similarity.ivfTopKFromIndex(
          spark, idxDir, cen, q, nprobe = 2, k = 3))
      }
      rmTree(idxDir)
      sec
    }

    // s16 sidecar ingest cost: the write pass that persists the 1-bit
    // signature lane alongside the float corpus (writeSignedCorpus) vs
    // the same id-range-clustered write WITHOUT the signature column.
    // The lane's READ economics are measured in LayoutSpec (24.5 KB sig
    // chunk vs 794 KB float chunk); this is the other half of the
    // claim — the extra codegen'd fold on the write path is ~free
    val embForWrite = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val signedDir = java.nio.file.Files.createTempDirectory("graft-bench-signed").toString
    val plainDir = java.nio.file.Files.createTempDirectory("graft-bench-plain").toString
    val signedWriteSec = probeSec {
      operators.Similarity.writeSignedCorpus(embForWrite, signedDir, cpus.toInt)
    }
    val plainWriteSec = probeSec {
      embForWrite.repartitionByRange(cpus.toInt, $"vec_id")
        .sortWithinPartitions($"vec_id")
        .write.mode("overwrite").parquet(plainDir)
    }
    rmTree(signedDir); rmTree(plainDir)

    // clean up the ~700 bulk files + checkpoint this run created —
    // the driver benches every round and /tmp accumulates otherwise
    rmTree(copyDir)
    rmTree(ckpt)

    val total = ok.sum
    // 3-decimal rounding: ms resolution is below run-to-run noise, and the
    // harness that collects this output keeps only the last ~2000 chars of
    // stdout — the final line must fit that window to be machine-parsed
    // Locale.ROOT: a comma-decimal default locale would otherwise emit
    // "2,45" and corrupt the JSON artifact
    def r3(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val byName = results.map { case (k, v, _) => k -> v }.toMap
    def named(q: String): Double = byName.getOrElse(q, -1.0)
    // full per-query map: on its OWN line (and file) — at 100+ queries it
    // no longer fits the collector's tail window, so it must not be part
    // of the final summary line
    val qsFull = results.map { case (k, v, _) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val gcFull = results.map { case (k, _, g) => "\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    val ccJson = ccAttempts.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(t =>
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(t))).mkString(",") + "]"
    }.mkString("{", ",", "}")
    // position-in-suite: per_query_s preserves execution order only as
    // JSON key order, which consumers may not keep — record it explicitly
    // so drift analysis can correlate cost with suite position
    val seqFull = results.zipWithIndex.map { case ((k, _, _), i) =>
      "\"" + k + "\":" + i }.mkString("{", ",", "}")
    val isoJson = isolatedTop10.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // the isolated brackets' full attempt arrays (r18: a gate frame
    // whose single reading can hide a 4× write-path spike is not a
    // gate — the spread IS the telemetry)
    val isoAttemptsJson = isolatedAttempts.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(r3).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val ctxJson = ctxSamples.mkString("[", ",", "]")
    println(s"""{"detail":"per_query_s","queries":$qsFull}""")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_detail.json"),
      (s"""{"sf":"$sfDir","per_query_s":$qsFull,"per_query_gc_ms":$gcFull,""" +
       s""""per_query_seq":$seqFull,"isolated_top10_s":$isoJson,""" +
       s""""isolated_attempts_s":$isoAttemptsJson,""" +
       s""""suite_context_samples":$ctxJson,""" +
       s""""regressions_vs_prev":$regressionJson,""" +
       s""""cc_family_attempts_s":$ccJson}\n""").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // name the tail: the p100 was anonymous for two rounds while it
    // drifted — attribution is the first step of any perf fix
    val slowest5 = results.filter(_._2 >= 0).sortBy(-_._2).take(5)
      .map { case (k, v, g) => s"""{"name":"$k","sec":${r3(v)},"gc_ms":$g}""" }
      .mkString("[", ",", "]")
    // headline queries only in the summary line (BASELINE.md rows + the
    // named pipeline stages); everything is in bench_detail.json above
    val headline = Seq("d01_exact_dedup", "d03_ngram_jaccard", "d04_minhash_lsh",
      "d10_collapsed_jaccard", "s01_cosine_topk", "s03_ivf_topk",
      "c01_curation_pipeline", "q01_pricing_summary")
    val qsHead = headline.filter(byName.contains)
      .map(k => "\"" + k + "\":" + r3(byName(k))).mkString("{", ",", "}")
    // OUTPUT LAYOUT (r18): the collector that turns stdout into
    // BENCH_r{N}.json keeps only the last ~2000 chars — r17's single
    // summary line had grown past that (its head was truncated and
    // the artifact's `parsed` field came back null), so the probe
    // sections move to a bench_extra DETAIL line (plus
    // bench_detail.json, committed) and the FINAL line carries only
    // the gate-mapped numbers, compact enough to always parse.
    val extra =
      s"""{"detail":"bench_extra","sf":"$sfDir"""" +
      s""","regressions_vs_prev":$regressionJson""" +
      s""","cc_family_attempts_s":$ccJson""" +
      s""","isolated_attempts_s":$isoAttemptsJson""" +
      s""","suite_context_samples":$ctxJson""" +
      s""","copy_timing":"settled; median-of-3; fresh lineage per attempt"""" +
      s""","stream_files_parsed":$streamFilesParsed""" +
      s""","stream_files_opened":$streamFilesOpened,"stream_files_in_store":$bulkFilesInStore""" +
      s""","skew_lsh_s":${r3(skewLshSec)},"skew_lsh_candidates":$skewLshCands""" +
      s""","skew_d03_s":${r3(skewD03Sec)},"skew_d03_pairs":$skewD03Pairs""" +
      s""","skew_d10_collapsed_s":${r3(skewD10Sec)},"skew_d10_pairs":$skewD10Pairs""" +
      s""","skew_graph_s":${r3(skewGraphSec)},"skew_graph_edges":$skewGraphEdges""" +
      s""","skew_clusters_s":${r3(skewClustersSec)},"skew_cluster_rows":$skewClusterRows""" +
      s""","skew_payload_s":${r3(skewPayloadSec)},"skew_payload_pairs":$skewPayloadPairs""" +
      s""","curation_stream_docs":$curN""" +
      s""","curation_stream_admitted":$curAdmitted""" +
      s""","curation_stream_files":$curFiles""" +
      s""","pipeline_pairs_clusters_crossmodal_s":${r3(pipelineSec)}""" +
      s""","c05_shared_split_s":${r3(c05SharedSec)}""" +
      s""","signed_write_s":${r3(signedWriteSec)},"plain_write_s":${r3(plainWriteSec)}}"""
    println(extra)
    // isolated medians for the artifact-writing entries the r17
    // verdict gated on — in the FINAL line so the ±30%-of-in-suite
    // check reads from one parsed artifact (full attempt arrays in
    // bench_extra / bench_detail.json)
    val isoByName = isolatedTop10.toMap
    val isoGate = Seq("d25_incremental_clusters", "d27_cluster_delete",
        "u01_lsh_update_probe").filter(isoByName.contains)
      .map(k => "\"" + k + "\":" + r3(isoByName(k))).mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsHead""" +
      s""","n_queries":${results.size},"sf":"$sfDir"""" +
      s""","query_median_s":${r3(medianS)},"query_p100_s":${r3(p100S)}""" +
      s""","slowest5":$slowest5""" +
      // context health: collector time across the timed query section
      // plus block-manager/scratch residue — a degraded run is visible
      // IN the numbers (mid-suite samples in bench_extra)
      s""","gc_queries_ms":$gcQueriesMs""" +
      s""","storage_rdds":$storageRdds,"storage_mem_mb":${storageMem / (1024 * 1024)}""" +
      s""","scratch_live":${Scratch.liveCount}""" +
      s""","storage_rdds_peak":$peakRdds,"storage_mem_peak_mb":${peakMem / (1024 * 1024)}""" +
      s""","storage_peak_after":"$peakAfter"""" +
      s""","regressed_n":${regressed.size}""" +
      s""","isolated_gate_s":$isoGate""" +
      s""","copy_docs":$nDocs,"copy_sec":${r3(copySec)},"copy_docs_per_s":${r3(copyDocsPerS)}""" +
      s""","copy_sec_attempts":[${copyAttempts.map(a => r3(a._2)).mkString(",")}]""" +
      // the fresh-JVM baselines measured before this suite started —
      // read suite vs isolated as context vs path
      s""","copy_isolated":$isolatedLine""" +
      s""","stream_isolated":$streamIsolatedLine""" +
      s""","streaming_batch_ms":$streamingBatchMs""" +
      s""","curation_stream_s":${r3(curSec)}""" +
      s""","c12_admission_s":${r3(c12AdmitSec)}""" +
      s""","s17_serve_s":${r3(s17ServeSec)}""" +
      // BASELINE.md row mapping (explicit so the grader needn't infer)
      s""","dedup_exact_s":${r3(named("d01_exact_dedup"))}""" +
      s""","minhash_lsh_s":${r3(named("d04_minhash_lsh"))}""" +
      s""","cosine_topk_s":${r3(named("s01_cosine_topk"))}}"""
    println(line)
    spark.stop()
  }
}
