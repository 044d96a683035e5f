package graft.sources

import graft.{DeclaredQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{toColumn, toExpression}

/** Z-order clustered table layout (SURVEY.md §2 A6/F1 at the storage
  * boundary): rewrite a table sorted by the Morton interleave
  * ([[graft.functions.ZOrder64]]) of two filter dimensions, so parquet
  * row-group min/max stats prune scans with a predicate on EITHER
  * dimension — the OPTIMIZE ZORDER BY of the lakehouse engines,
  * expressed as plain Spark primitives: `repartitionByRange` on the
  * z-key (range exchange = global clustering across files) +
  * `sortWithinPartitions` (row-group clustering within files) +
  * parquet's own statistics. No custom reader: pushed-down filters do
  * the skipping.
  *
  * Why it matters at 100 TB: an events table laid out by arrival time
  * answers time-range scans with file/row-group pruning but reads
  * EVERYTHING for a user-scoped query; z-ordering (user, hour) serves
  * both access paths from one copy. ZOrderSpec measures the effect:
  * scan output rows for a user-range predicate drop ~10× vs a
  * time-sorted layout of the same data.
  */
object ClusteredLayout {

  /** The events clustering dimensions: tenant and time bucket. */
  def eventDims: (Column, Column) =
    (col("user_id"), expr("CAST(ts AS BIGINT) div 3600"))

  /** Balanced z-key: each dimension linearly scaled to 16 bits over
    * its actual [min, max] BEFORE interleaving. Without this the wider
    * dimension's high bits dominate every comparison and the layout
    * degenerates to a plain sort on it (measured: 720 hour buckets vs
    * 150 users left user_id completely unclustered). The min/max pass
    * is one tiny aggregate — at 100 TB the bounds come from table
    * stats or the domain.
    */
  def scaledZKey(df: DataFrame, a: Column, b: Column): Column = {
    val r = df.agg(
      min(a.cast("long")), max(a.cast("long")),
      min(b.cast("long")), max(b.cast("long"))).head()
    // empty table (or all-null dim) → null bounds; any constant key
    // clusters a zero-row write correctly
    def bound(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    def scale(c: Column, lo: Long, hi: Long): Column =
      floor((c.cast("double") - lit(lo.toDouble)) * lit(65535.0) /
        lit(math.max(hi - lo, 1L).toDouble)).cast("long")
    toColumn(graft.functions.ZOrder64(
      toExpression(scale(a, bound(0), bound(1))),
      toExpression(scale(b, bound(2), bound(3)))))
  }

  /** One row group per range-partitioned file: `nFiles` is the
    * pruning granularity (a 2^k file count yields a √nFiles × √nFiles
    * grid over the two dimensions).
    */
  def zorderWrite(df: DataFrame, zkey: Column, outDir: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, zkey)
      .sortWithinPartitions(zkey)
      .write.mode("overwrite").parquet(outDir)

  /** Cluster-once cache per corpus dir (the cachedDsirShards pattern;
    * the rewrite is deterministic up to range-sampling boundaries,
    * which only move rows between files — query results never change).
    */
  private val layoutCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def cachedZorderedEvents(spark: SparkSession, sfDir: String): String =
    // latch-after-write under a per-key lock (graft.Memo.latched,
    // round-15 review — was a hand-expanded copy under one global
    // monitor; round-13: the earlier unsynchronized check-then-act
    // let concurrent first callers each run the full rewrite,
    // orphaning the loser's 32-file copy on RAM-backed scratch)
    graft.Memo.latched(layoutCache, sfDir) {
      val path = graft.SparkEnv.scratchDir(
        s"zorder-events-${java.lang.Integer.toHexString(sfDir.hashCode)}")
      val ev = Tables.events(spark, sfDir)
      val (a, b) = eventDims
      zorderWrite(ev, scaledZKey(ev, a, b), path, nFiles = 32)
      path
    }

  /** Hash-gated: a two-dimension selective scan over the z-ordered
    * copy. Values are layout-independent (the oracle reads the RAW
    * events table), so the gate proves the rewrite is lossless; the
    * skipping itself is ZOrderSpec's metric assertion. `ts` is
    * date_trunc'd per the fixture type-parity rule.
    */
  val qZorderScan = DeclaredQuery(
    "q_zorder_scan",
    """SELECT event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE user_id BETWEEN 3 AND 7
      |  AND ts < TIMESTAMP '2024-01-16 00:00:00'
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val path = cachedZorderedEvents(s, d)
    s.read.parquet(path)
      // to_timestamp parses in the SESSION timezone (pinned UTC) like
      // the SQL literal both engines cut at; java.sql.Timestamp.valueOf
      // parsed in the JVM DEFAULT timezone, which nothing pins — on a
      // non-UTC JVM the cut drifted by the zone offset (round-13
      // review; the only main-code use of that pattern)
      .filter(col("user_id").between(3, 7) &&
        col("ts") < to_timestamp(lit("2024-01-16 00:00:00")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  val all: Seq[DeclaredQuery] = Seq(qZorderScan)
}
