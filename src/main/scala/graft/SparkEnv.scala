package graft

import org.apache.spark.sql.SparkSession

/** Session plumbing shared by the driver-facing mains and tests.
  *
  * Two environment facts (measured, 2026-08-12) make this worth
  * centralizing:
  *
  *  1. The rootfs is ext4 mounted with `discard` inside a Firecracker
  *     VM — shuffle/spill/checkpoint file churn triggers TRIM storms
  *     that show up as multi-second all-core *system*-time stalls.
  *     Putting `spark.local.dir` (shuffle, broadcast, spill) and
  *     streaming checkpoints on tmpfs (`/dev/shm`) removes the stall:
  *     the minhash pipeline went 19-28 s → ~2 s at sf0.1.
  *     (At cluster scale the analog is: local dirs on instance NVMe,
  *     never on a thin-provisioned network volume.)
  *
  *  2. The host ramps vCPU speed under sustained load (~10× slower
  *     cold: a fixed spin loop measured 1.9k → 19k iterations/0.5 s
  *     over ~20 s). Benchmarks must warm the CPU, not just the JIT —
  *     see Bench.warmCpu.
  */
object SparkEnv {

  /** Streaming state-partition count — the `spark.sql.shuffle
    * .partitions` every stateful stream's cloned session runs with.
    * One state store per partition, each paying open + delta-write +
    * commit PER MICRO-BATCH, so the count is sized to STATE VOLUME,
    * not CPU count: the declared pipelines hold 10³–10⁴ keys, and the
    * round-11 floor profile (SCALING.md, tools/StreamFloorProf)
    * measured the marginal batch at 8 → 2 partitions dropping
    * 693 → 445 ms (addBatch 493 → 285 ms — per-store commit overhead,
    * not data). At real state volumes raise SPARK_GRAFT_STATE_
    * PARTITIONS (or the test prop) — the stores shard linearly.
    * Centralized here because every stateful runner and the A/B
    * harnesses must agree (round-11; was 12 scattered "8" literals).
    */
  def stateParts: String = sys.props.getOrElse("graft.test.stateParts",
    sys.env.getOrElse("SPARK_GRAFT_STATE_PARTITIONS", "2"))

  /** Cloned session for a stateful streaming pipeline (round 13 —
    * was 14 scattered newSession+conf.set blocks): state-partition
    * count sized to state volume ([[stateParts]]), and the state-store
    * provider selectable for measurement without a code change
    * (sys-prop `graft.test.stateProvider` / env
    * SPARK_GRAFT_STATE_PROVIDER = "rocksdb" — tools/StateAbProf's
    * same-JVM A/B). transformWithState pipelines pass rocksdb=true
    * unconditionally (Spark 4 requires that provider). The measured
    * default for the declared AGGREGATION pipelines stays HDFS-backed:
    * at their 10³–10⁴-key state sizes the in-heap map beats RocksDB's
    * per-batch native write/commit (SCALING.md round-13 A/B table);
    * RocksDB is the right provider when state outgrows executor heap —
    * key count, not a fixed class, decides.
    */
  def stateSession(parent: SparkSession, rocksdb: Boolean = false): SparkSession = {
    val s2 = parent.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", stateParts)
    val wantRocks = rocksdb || sys.props.get("graft.test.stateProvider")
      .orElse(sys.env.get("SPARK_GRAFT_STATE_PROVIDER")).contains("rocksdb")
    if (wantRocks) s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Checkpoint-log writer (round-16 optimization, the largest
    // per-micro-batch fixed cost found by StreamPhaseProf): every
    // offset-log / commit-log / file-source-log / state-delta /
    // RocksDB-upload write goes through CheckpointFileManager, and the
    // DEFAULT FileContext-based manager costs 33–130 ms PER FILE on
    // this host — no native-hadoop library is loadable
    // (NativeCodeLoader warning), so Hadoop's FileContext local path
    // forks a shell for permission ops on every create/rename. The
    // FileSystem-based manager (Spark's own fallback for filesystems
    // without an AbstractFileSystem, e.g. s3a) does the same
    // write+rename in 7–11 ms — still one forked chmod per created
    // file plus a checksummed `.crc` sidecar — and the library's
    // [[org.apache.spark.sql.execution.streaming.checkpointing.GraftLocalCheckpointFileManager]]
    // (that manager with a java.nio fast path for LOCAL checkpoint
    // dirs, non-local schemes delegate verbatim) does it in
    // 0.2–0.6 ms (tools/WalWriteProbe, all three measured
    // side-by-side). Same-JVM interleaved A/Bs over all 24
    // stream-backed declared queries (tools/StateKnobAb): the r16
    // FileSystem-manager step measured ≈ −8 s over the class vs the
    // FileContext default, and the NIO fast path another ≈ −3…−5 s vs
    // the FileSystem manager (plans/r16/ckptnio_ab_{1,2}.txt), biggest
    // on the multi-store pipelines (stream-stream joins: 4 join state
    // stores × parts × batches of delta/snapshot files; RocksDB zip
    // uploads). Trade-off, and why this is env-parameterized rather
    // than unconditional: on HDFS the FileContext manager's
    // rename-with-overwrite is atomic while the FileSystem/NIO
    // managers' overwrite path has a delete-then-rename /
    // check-then-rename window (only reachable on a crash-replay of
    // the same batch id); a 100 TB HDFS deployment sets
    // SPARK_GRAFT_CKPT_FM=default to keep Spark's default manager —
    // where the native lib is present and the fork penalty gone, the
    // managers are within noise anyway. The A/B hook below can still
    // override per run.
    sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
      "org.apache.spark.sql.execution.streaming.checkpointing." +
        "GraftLocalCheckpointFileManager") match {
      case "" | "default" => ()
      case cls => s2.conf.set("spark.sql.streaming.checkpointFileManagerClass", cls)
    }
    // dev A/B hook (round-15, tools/StateKnobAb): extra session confs
    // for same-JVM state-store knob measurement without a code change
    // — the stateProvider-hook pattern. Production config is the
    // explicit block above; nothing sets this prop outside harnesses.
    // ALLOWLISTED to the streaming conf namespace (advisor r15 #1): a
    // stray/leaked sys prop must not be able to reconfigure arbitrary
    // session behavior (e.g. swap a datasource or FS impl) on every
    // stateful stream — the knobs the harnesses measure all live under
    // spark.sql.streaming.*; anything else is rejected loudly.
    sys.props.get("graft.test.stateExtraConf").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        if (k.startsWith("spark.sql.streaming.") && v.nonEmpty) s2.conf.set(k, v)
        else if (k.nonEmpty) System.err.println(
          s"[graft] graft.test.stateExtraConf: rejecting non-streaming key '$k' " +
            "(allowlist: spark.sql.streaming.*)")
      }
    s2
  }

  /** Scratch root for Spark local dirs + streaming checkpoints:
    * tmpfs when available (always, in this environment), else the
    * default java tmpdir.
    */
  lazy val scratchRoot: String = {
    val shm = new java.io.File("/dev/shm")
    val root = if (shm.isDirectory && shm.canWrite)
      new java.io.File(shm, "graft-spark")
    else new java.io.File(sys.props("java.io.tmpdir"), "graft-spark")
    root.mkdirs()
    root.getAbsolutePath
  }

  /** Fresh scratch dir (checkpoints etc.) under the tmpfs root.
    * Every dir this JVM creates is deleted at JVM exit through
    * Spark's own TEMP_DIR-priority shutdown hook
    * ([[org.apache.spark.GraftScratchBridge]]) — correctly ordered
    * after stream/context shutdown. Round-8 review: declared queries
    * mint per-run checkpoint / store / export dirs on tmpfs, and
    * repeated bench/tool runs were accumulating RAM-backed copies in
    * /dev/shm for the machine's lifetime. Only THIS process's dirs
    * are registered — concurrent JVMs sharing the root are unaffected.
    */
  /** Best-effort recursive scratch-dir deletion (the cache losers'
    * cleanup path). One implementation (round-14 review — Similarity
    * and Importance each carried a copy, and Importance's weaker one
    * let an IO exception fail the query over a best-effort cleanup):
    * Files.walk with the stream CLOSED in finally (it holds open dir
    * handles) and a catch-all — cleanup never outranks the query.
    */
  private[graft] def deleteDir(path: String): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close() // walk holds open dir handles
    } catch { case _: Throwable => () }

  def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(scratchRoot), prefix)
    org.apache.spark.GraftScratchBridge.deleteOnExit(dir.toFile)
    dir.toString
  }

  /** The session's configured shuffle parallelism, as an Int — what a
    * declared query derives explicit partition counts / block factors
    * from instead of baking in a bench-host literal (round-14 verdict:
    * `repartition(32, …)` and `blocks = 8` were local[32]-tuned
    * constants; a cluster deployment wants them to track the session's
    * own sizing knob, which [[builder]] sets to the core count here
    * and AQE + initialPartitionNum govern at 100 TB).
    */
  def shuffleParts(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Common config for every session this library creates: local-mode
    * parallelism from SPARK_GRAFT_CPUS (default = all cores), shuffle
    * partitions matched to cores (not 200 — right-sized for the data
    * scale; at 100 TB this knob is AQE + initialPartitionNum instead),
    * UTC, tmpfs local dir, and the legacy ns-parquet read mode —
    * LOAD-BEARING for the unit-aware events loader: under it a
    * timestamp[ns] fixture surfaces `ts` as LongType, which is the
    * branch Tables.events/Ingest.eventStream key their ns handling on
    * (the current µs fixtures surface TimestampNTZType instead; the
    * driver has shipped both units — FIXTURES.md trap 1).
    */
  def builder(): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      // AQE stays ON by default (the 100 TB posture: runtime
      // coalescing, skew-join splitting). SPARK_GRAFT_AQE=false is the
      // measured interactive-latency lever for sub-second inputs: each
      // AQE stage is a separate job with a materialization barrier, a
      // pure fixed cost when every shuffle is already KB-sized
      // (tools/PhaseProf A/B, round 9).
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", scratchRoot)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ObjectHashAggregate falls back to SORT-based aggregation past
      // this many in-memory groups — default 128, which made the
      // 249-group q_sketch_percentiles pay a full 600k-row sort
      // (measured 2.85 → 1.21 s; tools/SketchProf). 1024, not higher:
      // the knob is session-global and also governs UNBOUNDED object
      // aggregates (collect_set bucket lists, exact percentile), whose
      // worst-case concurrent buffer memory it multiplies — the
      // engine's own sketch UDAFs hold bounded O(k) state (~4–32 KB)
      // but the collect paths are only df-ceiling/bucket-bounded, so
      // the sort fallback must stay reachable for them (round-8
      // review). 1024 clears every declared >128-group sketch
      // aggregation with headroom at 8× less exposure than 4096; at
      // 100 TB size it to state-size × per-task group cardinality.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1024")
      // Whole-stage-codegen COMPILE cache (Janino), default 100
      // entries. A 218-query suite holds ~2k distinct codegen units, so
      // at the default every action recompiled every unit on every
      // pass — measured as the dominant share of the per-action floor
      // (round-13 FloorProf + full-suite A/B: suite total 96.9 → 72.2 s
      // at 5000 entries; q_brand_affinity 0.84 → 0.41 s). Static conf:
      // must be set before the first session. Memory cost is bounded
      // (compiled classes, ~10–100 KB each); a 100 TB driver serving a
      // large query library wants the same sizing — recompilation is
      // per-JVM fixed cost, not data cost.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .withExtensions(new GraftExtensions)
    // dev A/B passthrough: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — lets
    // tools/TimeQuery-style harnesses measure a conf posture without a
    // code change; production config stays the explicit block above.
    // Every applied override is logged loudly (advisor r10: a silent
    // env passthrough can undo the tuned block), and malformed
    // entries (empty key or value) are rejected rather than setting
    // an empty-valued conf.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).map(_.trim).filter(_.contains("="))
      .foldLeft(b) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2)
        if (k.isEmpty || v.isEmpty) {
          System.err.println(s"[graft] SPARK_GRAFT_EXTRA_CONF: ignoring malformed entry '$kv'")
          bb
        } else {
          System.err.println(s"[graft] SPARK_GRAFT_EXTRA_CONF override: $k=$v")
          bb.config(k, v)
        }
      }
  }
}
