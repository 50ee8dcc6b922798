package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** foreachBatch → parquet gate harness: the bridge that turns streaming
  * transforms into artifacts the SAME correctness oracle that gates the
  * batch operators can check. The driver's DuckDB gate is batch-only
  * (it compares materialized parquet), so streaming evidence is produced
  * transitively: drive the stream through the production parquet sink,
  * read the result back, and assert equality with the oracle-gated batch
  * twin on identical input — stream output == batch output == DuckDB.
  *
  * The sink is [[Streaming.idempotentParquetSink]] — the real
  * batch-addressed exactly-once-effect landing path, not a test-only
  * shortcut — so the gate evidence also exercises checkpointing and the
  * partition-discovery read-back a production consumer performs.
  */
object StreamGate {

  // one gate-scoped child per root session (weak keys: a stopped root
  // session must not be pinned by the cache); conf set only at creation
  private val gateSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  private[streaming] def sessionFor(spark: SparkSession): SparkSession =
    gateSessions.synchronized {
      var child = gateSessions.get(spark)
      if (child == null) {
        child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", "8")
        // Per-micro-batch sink-commit cost: every batch's foreachBatch
        // parquet write pays the full FileOutputCommitter protocol.
        // v2 commits task output directly at task commit (no job-level
        // re-rename pass) and the _SUCCESS marker is pure overhead here
        // (read-back uses partition discovery, and batch idempotence
        // comes from the per-batch-dir overwrite, not the marker). Both
        // scoped to the gate child session.
        child.conf.set(
          "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        child.conf.set(
          "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        gateSessions.put(spark, child)
      }
      child
    }

  /** Build a streaming DataFrame with `build` (against a gate-scoped
    * child session — see below), start it into the idempotent parquet
    * sink at `outDir/data` (checkpoint at `outDir/_checkpoint`), run
    * each `feed` thunk in order draining the stream to completion after
    * each (so a caller can stage multi-batch arrival patterns with a
    * MemoryStream), and return the landed table read back as a batch
    * DataFrame. The sink's `batch_id` partition column is dropped on
    * read-back by default (it records delivery, not data); complete-
    * mode callers pass `keepBatchId = true` to select the final
    * emission themselves.
    *
    * `build` receives a CACHED `spark.newSession()` child (same
    * SparkContext, shared extensions — so every native function is
    * registered — but ISOLATED SQL conf) with the gate's
    * shuffle-partition setting applied, and must construct the whole
    * query against it: sources read through the child bind the query to
    * the child's conf, so the setting scopes to gate queries instead of
    * toggling the shared session's conf under concurrently running
    * queries (the old set/restore-in-finally spelling was a read-torn
    * race for any parallel suite on the shared session). The child is
    * created ONCE per root session and reused by every gate: a fresh
    * `newSession()` per call rebuilds the whole SessionState (analyzer,
    * optimizer, all eleven extension injections) and cost the r11 bench
    * a measured ~0.2-0.5 s PER stream gate over r10; the child's conf is
    * written only at creation, so reuse is race-free. Feed-staged
    * MemoryStream callers create their stream inside `build` from the
    * session it receives.
    */
  /** Dev-only intra-gate timing (`SPARK_GRAFT_STREAM_PROF=1`): dumps the
    * harness phase times and Spark's own per-micro-batch duration
    * breakdown (`StreamingQueryProgress.durationMs`) to stderr, so "the
    * streaming family costs ~0.8 s/gate" can be attributed to planning /
    * state-store commit / sink write / harness instead of guessed at.
    * Zero cost when unset.
    */
  private val profEnabled = sys.env.get("SPARK_GRAFT_STREAM_PROF").contains("1")

  def runToParquet(spark: SparkSession, build: SparkSession => DataFrame,
      outDir: String, outputMode: String = "append",
      keepBatchId: Boolean = false)
      (feeds: (() => Unit)*): DataFrame = {
    val profT0 = System.nanoTime()
    def profMark(label: String, t0: Long): Long = {
      val now = System.nanoTime()
      if (profEnabled)
        System.err.println(f"[streamprof] $outDir%s $label%-10s ${(now - t0) / 1e9}%.3f s")
      now
    }
    // No staged feeds → the fixture is fully present at start, so run
    // under Trigger.AvailableNow: the query drains the source, runs the
    // extra batch stateful operators request after the watermark
    // advances (emitting finalized windows / firing timeouts — same
    // emitted set as the processAllAvailable loop, StreamingSpec pins
    // batch parity), and terminates on its own instead of idling
    // between polled micro-batches. Feed-staged callers keep the
    // default trigger: AvailableNow snapshots the source at start and
    // would never see rows a later feed() adds.
    // Stateful operators instantiate one state store per shuffle
    // partition per operator per micro-batch; at gate scale (a finite
    // fixture, minutes of data) 32 partitions are pure setup overhead,
    // so the gated stream runs at 8 — on a CHILD session, so the shared
    // session's conf is never touched. The number is baked into the
    // query's checkpoint at first start — a production deployment sizes
    // it for its own throughput; every gated transform is
    // partition-count-invariant (specs/oracles pin that), so this only
    // moves harness time, not results.
    val gateSession = sessionFor(spark)
    val out = build(gateSession)
    require(out.sparkSession eq gateSession,
      "StreamGate: build(session) must construct its sources from the " +
        "session it receives — a query bound to another session would " +
        "not pick up the gate-scoped conf")
    val tBuilt = profMark("build", profT0)
    val q = Streaming.idempotentParquetSink(out, s"$outDir/data",
      s"$outDir/_checkpoint", outputMode, availableNow = feeds.isEmpty)
    val tStarted = profMark("start", tBuilt)
    try {
      if (feeds.isEmpty) q.awaitTermination()
      else feeds.foreach { f => f(); q.processAllAvailable() }
    } finally q.stop()
    val tDrained = profMark("drain", tStarted)
    if (profEnabled) q.recentProgress.foreach { p =>
      System.err.println(s"[streamprof] $outDir batch=${p.batchId} " +
        s"rows=${p.numInputRows} durationMs=${p.durationMs}")
    }
    // Read back with the KNOWN schema (the sink landed exactly `out`'s
    // columns; `batch_id` is the sink's directory partition column,
    // discovered as int) — an explicit schema skips the footer-read
    // schema inference a fresh temp directory can never have cached,
    // while partition DISCOVERY (the layout under test) still runs.
    val landedSchema = org.apache.spark.sql.types.StructType(
      out.schema.fields :+ org.apache.spark.sql.types.StructField(
        "batch_id", org.apache.spark.sql.types.IntegerType))
    val landed = spark.read.schema(landedSchema).parquet(s"$outDir/data")
    // Update-mode sinks RE-EMIT a group in every micro-batch where it
    // changes, each landing under its own batch_id — a multi-batch run
    // would leave stale earlier rows in the read-back and the gate
    // would silently compare a superset. Today's update-mode gates are
    // single-batch by construction (the whole fixture arrives in
    // micro-batch 0 under AvailableNow), so enforce that loudly instead
    // of assuming it: if batching ever changes, this trips rather than
    // a hash mysteriously mismatching (or worse, matching).
    if (outputMode == "update") {
      // "batches that emitted rows" counted from the sink's own layout —
      // a batch_id=N dir holds a part file iff that batch wrote ≥1 row
      // (empty partitions produce no files) — so the check is two local
      // directory listings instead of a Spark job per gate.
      val dataDir = new java.io.File(s"$outDir/data")
      val batches = Option(dataDir.listFiles()).toSeq.flatten
        .filter(d => d.isDirectory && d.getName.startsWith("batch_id="))
        .count(d => Option(d.listFiles()).toSeq.flatten
          .exists(_.getName.startsWith("part-")))
      require(batches <= 1,
        s"StreamGate: update-mode gate landed $batches micro-batches; " +
          "the read-back would contain stale re-emitted group rows - " +
          "keep only each group's max-batch_id row before comparing")
    }
    val res = if (keepBatchId) landed else landed.drop("batch_id")
    if (profEnabled) { res.count(); profMark("readback", tDrained); profMark("total", profT0) }
    res
  }
}
