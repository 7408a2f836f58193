package graft.sources

import org.apache.spark.sql.DataFrame
import java.util.concurrent.atomic.AtomicLong

/** A5 integration closure — the live keyed-HTTP dimension edge.
  *
  * The reference enriches each order by keyed REST point lookups
  * (`api_to_gcs/main.py:205-231` — contato by id, the N+1 pattern). The
  * engine models the SEMANTICS as first-match/broadcast dimension joins
  * ([[graft.operators.Dimensions]], oracle-checked); what stayed
  * document-only was the live-edge FORM, because no API existed in the
  * sandbox. This closes it with the JDK's own embedded `HttpServer` (the
  * [[graft.streaming.EmbeddedLog]] move applied to A5): [[serve]] exposes
  * a dimension as `GET /dim?key=K`, and [[lookupValues]] runs the
  * production client shape — `mapPartitions` with ONE `HttpClient` and an
  * in-partition key cache, so the edge issues one GET per DISTINCT key
  * per partition instead of the reference's call-per-row; 404 maps to
  * null (left-join semantics). The spec proves the HTTP edge returns
  * exactly the broadcast join's rows and that the request counter stays
  * ≤ distinct-keys × partitions — the cache collapsing the N+1 pattern
  * is asserted, not assumed.
  *
  * Scale: the per-partition client amortizes connection setup the way a
  * real enrichment edge must. The I7 retry envelope the reference wraps
  * around every API call (`api_to_gcs/main.py:56` — tenacity, exponential
  * backoff, bounded attempts) attaches HERE: [[lookupValues]] retries
  * transient failures (connect errors, 5xx) with bounded exponential
  * backoff and fails the task once attempts exhaust. Only 404 maps to
  * null — a 500/503 must surface as an error, never masquerade as an
  * absent key (left-join semantics are for MISSING rows, not sick
  * servers). I9 (rate limits) stays scoped out. */
object HttpDim {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  /** Requests served since [[serve]] — the spec's cache-effectiveness
    * probe (single-JVM local[] tests share this counter with the server). */
  val requests = new AtomicLong(0)

  /** Serve `dim` as `GET <base>?key=K` on an ephemeral localhost port;
    * returns (server, baseUrl). Caller stops the server. */
  def serve(dim: Map[String, String]): (HttpServer, String) = {
    val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/dim", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val q = Option(ex.getRequestURI.getQuery).getOrElse("")
        val key = q.split("&").map(_.split("=", 2)).collectFirst {
          case Array("key", v) => java.net.URLDecoder.decode(v, "UTF-8")
        }.getOrElse("")
        dim.get(key) match {
          case Some(v) =>
            val b = v.getBytes("UTF-8")
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          case None => ex.sendResponseHeaders(404, -1)
        }
        ex.close()
      }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}/dim")
  }

  /** Fetch one key with the I7 envelope: up to `attempts` tries,
    * exponential backoff (`baseBackoffMs · 2^i`). 200 → Some(body),
    * 404 → None (a genuinely absent key), anything else — 5xx, or a
    * connect/IO error while the server is down — is transient and
    * retried; the LAST failure is rethrown so a sick server fails the
    * task loudly instead of leaking nulls into the enrichment. */
  private[graft] def fetchWithRetry(client: java.net.http.HttpClient,
      url: String, attempts: Int, baseBackoffMs: Long): Option[String] = {
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url)).GET().build()
    var i = 0
    while (true) {
      val outcome: Either[Throwable, Option[String]] =
        try {
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => Right(Some(resp.body()))
            case 404 => Right(None)
            case s => Left(new java.io.IOException(
              s"transient HTTP $s from $url"))
          }
        } catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(v) => return v
        case Left(e) if i >= attempts - 1 => throw e
        case Left(_) =>
          Thread.sleep(baseBackoffMs << i)
          i += 1
      }
    }
    None // unreachable
  }

  /** The client pass: one `HttpClient` + key cache per partition, one
    * GET per distinct key, 404 → null, transient failures retried with
    * bounded exponential backoff (then thrown). Returns (key, value)
    * rows the caller joins back — keeping the edge a narrow keyed
    * fetch, exactly the reference's lookup grain. */
  def lookupValues(keys: org.apache.spark.sql.Dataset[Long],
      baseUrl: String, attempts: Int = 4,
      baseBackoffMs: Long = 50L): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.mapPartitions { it =>
      val client = java.net.http.HttpClient.newHttpClient()
      val cache = scala.collection.mutable.Map.empty[Long, Option[String]]
      it.map { k =>
        val v = cache.getOrElseUpdate(k,
          fetchWithRetry(client, s"$baseUrl?key=$k", attempts, baseBackoffMs))
        (k, v.orNull)
      }
    }.toDF("key", "value")
  }
}
