package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP JSON serving layer over a [[ServingStore]] (SURVEY.md §2 A7):
  * the reference's public face — GET a calendar-counter prefix, get
  * JSON back — re-expressed over the same store the streaming sink
  * feeds. JDK `com.sun.net.httpserver`, zero dependencies, loopback
  * only (no external services in this environment; a production
  * deployment fronts the real KV, this proves the contract).
  *
  * Routes:
  *   - `GET /stats/<key-prefix>` → `{"<key>": {"n_events": n,
  *     "sum_value": v}, ...}` for every counter whose key starts with
  *     the prefix, key-sorted (the Redis SCAN-by-prefix shape, same
  *     contract the DSv2 source pushes down).
  *   - `GET /stats/<key-prefix>?agg=sum` → one aggregate object
  *     `{"n_events": Σn, "sum_value": Σv, "n_keys": k}` — the HTTP
  *     twin of the source's complete aggregate pushdown (and like it,
  *     sums over an empty prefix are null, not 0).
  *
  * Serving reads go through `store.lookupRows(prefix)` — a
  * point-in-time read per request with the store as the consistency
  * boundary (micro-batch upserts are atomic per key). For the
  * partitioned parquet store that is a PRUNED scan (gran/pday
  * partition predicates derived from the prefix), the reference's
  * O(1)-per-key Redis read re-expressed as partition pruning.
  */
object HttpServing {

  private def jsonNum(d: Double): String =
    if (d.isNaN || d.isInfinite) "null" // JSON has no NaN/Infinity
    else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Render the per-key listing for one prefix. */
  def listJson(rows: Seq[ServingStore.CounterRow]): String =
    rows.sortBy(_.key).map { r =>
      s""""${esc(r.key)}": {"n_events": ${r.nEvents}, "sum_value": ${jsonNum(r.sumValue)}}"""
    }.mkString("{", ", ", "}")

  /** Render the aggregate answer for one prefix (empty → nulls). */
  def aggJson(rows: Seq[ServingStore.CounterRow]): String =
    if (rows.isEmpty) """{"n_events": null, "sum_value": null, "n_keys": 0}"""
    else {
      val n = rows.map(_.nEvents).sum
      val v = rows.map(_.sumValue).sum
      s"""{"n_events": $n, "sum_value": ${jsonNum(v)}, "n_keys": ${rows.size}}"""
    }

  /** Start serving `store` on loopback. `port = 0` picks a free port;
    * returns the server (call `.stop(0)` when done) and the bound
    * port.
    */
  def start(store: ServingStore, port: Int = 0): (HttpServer, Int) = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/stats/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (status, resp) =
          try {
            val prefix = ex.getRequestURI.getPath.stripPrefix("/stats/")
            val rows = store.lookupRows(prefix)
            val query = Option(ex.getRequestURI.getQuery).getOrElse("")
            (200,
              if (query.split('&').contains("agg=sum")) aggJson(rows)
              else listJson(rows))
          } catch {
            case e: Exception => (500, s"""{"error": "${esc(e.toString)}"}""")
          }
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    (server, server.getAddress.getPort)
  }
}
