package graft.sources

import graft.{DeclaredQuery, SparkEnv}
import org.apache.spark.sql.SparkSession

/** Bucketed co-located joins (round 9; SURVEY §2 scale levers): the
  * other half of the shuffle-elimination story. CBO (queries/Cbo)
  * picks the cheapest JOIN ORDER from statistics; bucketing removes
  * the join SHUFFLE entirely — both fact tables are written
  * pre-hash-partitioned and pre-sorted on the join key, so a
  * sort-merge join zips matching buckets in place. At 100 TB this is
  * the difference between re-shuffling 100 TB per ad-hoc join and
  * paying the partitioning ONCE at ingest: the standard layout for a
  * fact table joined on the same key by every downstream query
  * (orders ⋈ lineitem on orderkey here).
  *
  * Mechanics: `bucketBy(8, key).sortBy(key)` external tables written
  * once per (context, sf) to tmpfs scratch; the declared query joins
  * them in a session with broadcast DISABLED — at the graded sf the
  * orders side is MBs and Spark would (correctly) broadcast it, but
  * the regime this operator exists for is both-sides-huge, where
  * broadcast is impossible and the only alternatives are a full
  * shuffle or this. BucketedJoinSpec asserts the plan property that
  * matters: a SortMergeJoin with ZERO exchanges in its subtree — scan
  * → (in-partition sort) → zip. The value gate is engine-independent:
  * the oracle replays the join semantics from the raw fixtures.
  */
object BucketedTables {

  private val buckets = 8

  /** Session with broadcast joins off — see scaladoc; memoized like
    * Cbo.cboSession.
    */
  private val joinSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  def joinSession(parent: SparkSession): SparkSession =
    joinSessions.computeIfAbsent(parent, p => {
      val c = p.newSession()
      c.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c
    })

  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write the fixture table bucketed+sorted on `key` as an external
    * catalog table (tmpfs path); idempotent per (context, sf).
    * Latch-after-write under a per-key lock via [[graft.Memo.latched]]
    * (round-15 review — was a hand-expanded copy of the idiom): the
    * bucketed write is the likeliest step here to throw (disk/tmpfs
    * full), and a latch-first memo would make every later call skip
    * registration and fail on a missing table far from the cause.
    */
  def bucketedTable(s: SparkSession, d: String, name: String,
      key: String, cols: Seq[String]): String = {
    // the raw dir's hash rides the table name (round-15 review: the
    // lossy punctuation sanitization alone could collide two distinct
    // fixture dirs onto one table, silently serving the first dir's
    // data for the second)
    val t = s"bkt_${name}_" + d.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + java.lang.Integer.toHexString(d.hashCode)
    val k = System.identityHashCode(s.sharedState) + "/" + t
    graft.Memo.latched(registered, k) {
      if (s.catalog.tableExists(t)) s.sql(s"DROP TABLE $t")
      s.read.parquet(s"$d/$name.parquet")
        .select(cols.head, cols.tail: _*)
        .write
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", SparkEnv.scratchDir(s"graft-bkt-$name"))
        .saveAsTable(t)
      t
    }
  }

  /** The join text over the bucketed tables — exposed so
    * BucketedJoinSpec can assert the exchange-free plan on the exact
    * declared shape.
    */
  def joinSql(s: SparkSession, d: String): String = {
    val o = bucketedTable(s, d, "orders", "o_orderkey",
      Seq("o_orderkey", "o_orderpriority", "o_orderdate"))
    val l = bucketedTable(s, d, "lineitem", "l_orderkey",
      Seq("l_orderkey", "l_extendedprice", "l_discount"))
    s"""SELECT o_orderpriority, count(*) AS n_items,
       |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
       |       AS DOUBLE) AS revenue
       |FROM $o JOIN $l ON o_orderkey = l_orderkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin
  }

  val qBucketedJoin = DeclaredQuery(
    "q_bucketed_join",
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,4)))
      |       AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    joinSession(s).sql(joinSql(s, d))
  }

  val all: Seq[DeclaredQuery] = Seq(qBucketedJoin)
}
