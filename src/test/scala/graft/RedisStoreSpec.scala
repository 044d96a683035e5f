package graft

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import graft.streaming.{RedisServingStore, ServingStore}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Protocol-level test of the dependency-free Redis adapter: an
  * in-process fake RESP server (HSET/SCAN/HGETALL/PING over real
  * sockets, concurrent connections) stands in for Redis, which this
  * environment does not have. Exercises executor-side pipelined
  * writes, replay idempotence, and the SCAN+HGETALL snapshot.
  */
class RedisStoreSpec extends SparkSpec {

  /** Just enough Redis: hashes in a ConcurrentHashMap, one thread per
    * connection, full-cursor SCAN (returns everything at cursor 0).
    */
  private final class FakeRedis {
    val data = new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
    private val server = new java.net.ServerSocket(0)
    def port: Int = server.getLocalPort
    @volatile private var running = true

    private val acceptor = new Thread(() => {
      while (running) {
        try {
          val sock = server.accept()
          val t = new Thread(() => serve(sock))
          t.setDaemon(true); t.start()
        } catch { case _: Throwable => () }
      }
    })
    acceptor.setDaemon(true); acceptor.start()

    def close(): Unit = { running = false; server.close() }

    private def serve(sock: java.net.Socket): Unit = {
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      try {
        while (true) {
          val cmd = readArray(in)
          if (cmd == null) return
          cmd.head.toUpperCase match {
            case "PING" => out.write("+PONG\r\n".getBytes(UTF_8))
            case "HSET" =>
              val h = data.computeIfAbsent(cmd(1), _ => new ConcurrentHashMap())
              var added = 0L
              cmd.drop(2).grouped(2).foreach { case Seq(f, v) =>
                if (h.put(f, v) == null) added += 1
              }
              out.write(s":$added\r\n".getBytes(UTF_8))
            case "SCAN" =>
              // honor MATCH <glob> like the real server (prefix globs
              // only — what the adapter's pruned lookupRows pushes)
              val pat = cmd.sliding(2).collectFirst {
                case Seq(m, p) if m.toUpperCase == "MATCH" => p }
              val keys = data.keySet().asScala.toSeq.sorted.filter(k =>
                pat.forall(p => k.startsWith(
                  p.stripSuffix("*").replace("\\", ""))))
              out.write("*2\r\n".getBytes(UTF_8))
              bulk(out, "0") // single full batch, cursor exhausted
              out.write(s"*${keys.length}\r\n".getBytes(UTF_8))
              keys.foreach(bulk(out, _))
            case "HGETALL" =>
              val h = data.getOrDefault(cmd(1), new ConcurrentHashMap())
              val pairs = h.asScala.toSeq.sortBy(_._1)
              out.write(s"*${pairs.length * 2}\r\n".getBytes(UTF_8))
              pairs.foreach { case (f, v) => bulk(out, f); bulk(out, v) }
            case other =>
              out.write(s"-ERR unknown command '$other'\r\n".getBytes(UTF_8))
          }
          out.flush()
        }
      } catch { case _: Throwable => () } finally sock.close()
    }

    private def bulk(out: OutputStream, s: String): Unit = {
      val b = s.getBytes(UTF_8)
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8)); out.write(b)
      out.write('\r'); out.write('\n')
    }

    private def readLine(s: InputStream): String = {
      val sb = new java.lang.StringBuilder
      var c = s.read()
      if (c == -1) return null
      while (c != '\r') { sb.append(c.toChar); c = s.read() }
      s.read() // \n
      sb.toString
    }

    /** Reads one client command (array of bulk strings); null at EOF. */
    private def readArray(s: InputStream): Seq[String] = {
      val header = readLine(s)
      if (header == null) return null
      require(header.startsWith("*"), s"expected array, got $header")
      (1 to header.tail.toInt).map { _ =>
        val len = readLine(s).tail.toInt
        val buf = new Array[Byte](len)
        var off = 0
        while (off < len) off += s.read(buf, off, len - off)
        s.read(); s.read() // CRLF
        new String(buf, UTF_8)
      }
    }
  }

  test("pipelined HSET writes land; snapshot reads them back via SCAN+HGETALL") {
    val fake = new FakeRedis
    try {
      val store = new RedisServingStore("localhost", fake.port)
      store.merge(0L, Seq(
        ServingStore.CounterRow("click/hour/2024-01-01-00", 5L, 1.5),
        ServingStore.CounterRow("view/hour/2024-01-01-00", 9L, 4.0)))
      // replay of the same totals: idempotent (HSET replaces)
      store.merge(0L, Seq(
        ServingStore.CounterRow("click/hour/2024-01-01-00", 5L, 1.5)))
      val got = store.snapshot().map(r => (r.key, r.nEvents, r.sumValue)).toSet
      assert(got == Set(
        ("click/hour/2024-01-01-00", 5L, 1.5),
        ("view/hour/2024-01-01-00", 9L, 4.0)), got)
    } finally fake.close()
  }

  test("lookupRows prunes server-side (SCAN MATCH) and pipelines the " +
      "hash reads — the reference's point-read path") {
    val fake = new FakeRedis
    try {
      val store = new RedisServingStore("localhost", fake.port)
      store.merge(0L, Seq(
        ServingStore.CounterRow("click/hour/2024-01-01-00", 5L, 1.5),
        ServingStore.CounterRow("click/hour/2024-01-01-01", 7L, 2.5),
        ServingStore.CounterRow("view/hour/2024-01-01-00", 9L, 4.0)))
      val got = store.lookupRows("click/hour/2024-01-01")
        .map(r => (r.key, r.nEvents)).toSet
      assert(got == Set(
        ("click/hour/2024-01-01-00", 5L),
        ("click/hour/2024-01-01-01", 7L)), got)
      assert(store.lookupRows("nope/").isEmpty)
    } finally fake.close()
  }

  test("executor-side sinkBatch writes partitions concurrently, no driver collect") {
    import spark.implicits._
    val fake = new FakeRedis
    try {
      val store = new RedisServingStore("localhost", fake.port)
      val keyed = (1 to 100).map(i => (s"k/$i", i.toLong, i / 2.0))
        .toDF("key", "n_events", "sum_value")
        .repartition(4) // four partitions -> four concurrent connections
      store.sinkBatch(keyed, batchId = 1L)
      assert(fake.data.size() == 100)
      val k7 = fake.data.get("k/7")
      assert(k7.get("n_events") == "7" && k7.get("sum_value") == "3.5")
      // batch replay overwrites the same keys with the same totals
      store.sinkBatch(keyed, batchId = 1L)
      assert(fake.data.size() == 100)
    } finally fake.close()
  }

  test("streaming pipeline sinks into the redis adapter end-to-end") {
    val fake = new FakeRedis
    try {
      val store = new RedisServingStore("localhost", fake.port)
      graft.streaming.Serving.runPipeline(spark, sf, store,
        SparkEnv.scratchDir("redis-pipe-ckpt"))
      val served = store.snapshot()
      assert(served.nonEmpty)
      // totals agree with the batch aggregation of the same events
      val batchTotal = Tables.events(spark, sf).count()
      assert(served.map(_.nEvents).sum == batchTotal,
        s"served=${served.map(_.nEvents).sum} batch=$batchTotal")
    } finally fake.close()
  }
}
