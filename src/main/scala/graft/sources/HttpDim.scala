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
  * real enrichment edge must. The full status-code state machine the
  * reference's envelope implies is now explicit, each class with its own
  * recovery:
  *
  *  - I7 retry (`api_to_gcs/main.py:56` — tenacity, exponential backoff,
  *    bounded attempts): connect errors and 5xx are TRANSIENT — retried
  *    with bounded exponential backoff, then thrown. Only 404 maps to
  *    null; a sick server must never masquerade as absent keys.
  *  - I9 rate limits (the reference's ERP API meters requests and
  *    answers 429): [[serveRateLimited]] meters with a token bucket and
  *    emits `429 + Retry-After`, and the client side honors it twice
  *    over — [[lookupValues]]' `maxRps` PACES proactively (on a cluster,
  *    give each task `globalBudget / concurrentTasks`), and
  *    [[fetchWithRetry]] sleeps the server-advised `Retry-After` on any
  *    429 that still slips through, on its own bounded budget separate
  *    from the transient-failure attempts (a metered server is not a
  *    sick server).
  *  - A7 auth ([[Secrets]]): 401/403 is PERMANENT at the fetch grain —
  *    never retried blindly (hammering a dead credential is how edges
  *    get locked out). One level up, [[lookupWithAuth]] runs the
  *    token-expiry loop: on 401 it invalidates the cached secret,
  *    re-resolves `latest`, and retries ONCE with the fresh token —
  *    the rotation-recovery shape every OAuth-ish integration needs. */
object HttpDim {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  /** Requests served since [[serve]] — the spec's cache-effectiveness
    * probe (single-JVM local[] tests share this counter with the server). */
  val requests = new AtomicLong(0)

  /** 429s emitted by [[serveRateLimited]] since start — lets the spec
    * distinguish "paced under the limit" (0) from "absorbed by the
    * Retry-After envelope" (>0). */
  val rejected429 = new AtomicLong(0)

  /** 401s emitted by an auth-checking server — the spec's probe that a
    * dead credential fails FAST (one request, no blind retries). */
  val rejected401 = new AtomicLong(0)

  private def writeBody(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, b.length)
    ex.getResponseBody.write(b)
  }

  private def keyOf(ex: HttpExchange): String = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    q.split("&").map(_.split("=", 2)).collectFirst {
      case Array("key", v) => java.net.URLDecoder.decode(v, "UTF-8")
    }.getOrElse("")
  }

  /** Serve `dim` as `GET <base>?key=K` on an ephemeral localhost port;
    * returns (server, baseUrl). Caller stops the server.
    *
    * `bearerToken`: when set, requests must carry
    * `Authorization: Bearer <token>` or get 401 (the A7 edge).
    * `bucketCapacity`/`refillPerSec`: when capacity > 0, a token bucket
    * meters requests; an empty bucket answers `429` with a
    * `Retry-After` header (delta-seconds, ceiling) — the I9 edge. Auth
    * is checked BEFORE the meter (a real gateway rejects bad
    * credentials without spending quota). */
  def serve(dim: Map[String, String], bearerToken: Option[String] = None,
      bucketCapacity: Int = 0, refillPerSec: Double = 0d,
      port: Int = 0): (HttpServer, String) = {
    val srv = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    // token bucket in nanos: tokens = min(cap, tokens + elapsed*rate)
    val lock = new Object
    var tokens = bucketCapacity.toDouble
    var lastNs = System.nanoTime()
    srv.createContext("/dim", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        requests.incrementAndGet()
        val authed = bearerToken.forall { t =>
          Option(ex.getRequestHeaders.getFirst("Authorization"))
            .contains(s"Bearer $t")
        }
        if (!authed) {
          rejected401.incrementAndGet()
          ex.sendResponseHeaders(401, -1)
        } else {
          val admitted = bucketCapacity <= 0 || lock.synchronized {
            val now = System.nanoTime()
            tokens = math.min(bucketCapacity.toDouble,
              tokens + (now - lastNs) / 1e9 * refillPerSec)
            lastNs = now
            if (tokens >= 1d) { tokens -= 1d; true } else false
          }
          if (!admitted) {
            rejected429.incrementAndGet()
            // delta-seconds ceiling, the header's wire grain
            val waitS = math.max(1L, math.ceil(1d / refillPerSec).toLong)
            ex.getResponseHeaders.set("Retry-After", waitS.toString)
            ex.sendResponseHeaders(429, -1)
          } else dim.get(keyOf(ex)) match {
            case Some(v) => writeBody(ex, 200, v)
            case None => ex.sendResponseHeaders(404, -1)
          }
        }
        ex.close()
      }
    })
    // daemon threads: HttpServer.stop() does NOT shut down a user
    // executor, and a non-daemon pool would pin the JVM open after main
    // returns (found the hard way — StreamDemo hung at exit)
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
      (r: Runnable) => {
        val t = new Thread(r, "httpdim-worker")
        t.setDaemon(true)
        t
      }))
    srv.start()
    (srv, s"http://127.0.0.1:${srv.getAddress.getPort}/dim")
  }

  /** The I9 form of [[serve]]: same dimension, metered. */
  def serveRateLimited(dim: Map[String, String], capacity: Int,
      refillPerSec: Double, bearerToken: Option[String] = None)
      : (HttpServer, String) =
    serve(dim, bearerToken, capacity, refillPerSec)

  /** Thrown on 401/403 — permanent at the fetch grain, never blindly
    * retried. [[lookupWithAuth]] catches it ONCE to refresh the token. */
  final class AuthFailure(msg: String) extends RuntimeException(msg)

  /** Fetch one key with the full envelope: up to `attempts` tries for
    * TRANSIENT failures (connect/IO errors, 5xx) with exponential
    * backoff (`baseBackoffMs · 2^i`), a separate `max429Waits` budget of
    * server-advised `Retry-After` sleeps for 429 (capped at 2 s per
    * wait — a local test server never advises more than 1 s; a
    * production cap belongs in config), 200 → Some(body), 404 → None (a
    * genuinely absent key), 401/403 → [[AuthFailure]] immediately. The
    * LAST transient failure is rethrown so a sick server fails the task
    * loudly instead of leaking nulls into the enrichment. */
  private[graft] def fetchWithRetry(client: java.net.http.HttpClient,
      url: String, attempts: Int, baseBackoffMs: Long,
      headers: Map[String, String] = Map.empty,
      max429Waits: Int = 8): Option[String] = {
    val b = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(url)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.build()
    var i = 0
    var waits429 = 0
    while (true) {
      // Left(transient) | Right(Left(retryAfterMs)) | Right(Right(value))
      val outcome: Either[Throwable, Either[Long, Option[String]]] =
        try {
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case 200 => Right(Right(Some(resp.body())))
            case 404 => Right(Right(None))
            case 401 | 403 => throw new AuthFailure(
              s"auth rejected (${resp.statusCode()}) at $url")
            case 429 =>
              // Retry-After may legally be an HTTP-date (non-numeric) or an
              // absurd numeric (this server emits Long.MaxValue when
              // refillPerSec = 0) — parse defensively and clamp the SECONDS
              // before the ms conversion, or *1000 overflows negative and
              // Thread.sleep throws, neither path treated as transient.
              // Floor at 250 ms: an explicit 'Retry-After: 0' must still
              // back off briefly — a 0 ms sleep is a hot retry against a
              // server that just said it was throttling
              val ra = resp.headers().firstValue("Retry-After")
              val secs =
                if (ra.isPresent) ra.get().trim.toLongOption else None
              Right(Left(secs
                .map(s => math.max(math.min(math.max(s, 0L), 2L) * 1000L, 250L))
                .getOrElse(1000L)))
            case s => Left(new java.io.IOException(
              s"transient HTTP $s from $url"))
          }
        } catch { case e: java.io.IOException => Left(e) }
      outcome match {
        case Right(Right(v)) => return v
        case Right(Left(waitMs)) =>
          if (waits429 >= max429Waits)
            throw new java.io.IOException(
              s"rate limit persisted past $max429Waits waits at $url")
          Thread.sleep(waitMs)
          waits429 += 1
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
    * bounded exponential backoff (then thrown), 429 absorbed via
    * Retry-After. `maxRps > 0` PACES the partition proactively — a
    * fixed inter-request interval of 1000/maxRps ms, the client half of
    * I9; on a cluster each task gets `globalBudget / concurrentTasks`.
    * Returns (key, value) rows the caller joins back — keeping the edge
    * a narrow keyed fetch, exactly the reference's lookup grain. */
  def lookupValues(keys: org.apache.spark.sql.Dataset[Long],
      baseUrl: String, attempts: Int = 4,
      baseBackoffMs: Long = 50L, maxRps: Double = 0d,
      headers: Map[String, String] = Map.empty): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.mapPartitions { it =>
      val client = java.net.http.HttpClient.newHttpClient()
      val cache = scala.collection.mutable.Map.empty[Long, Option[String]]
      val intervalNs = if (maxRps > 0) (1e9 / maxRps).toLong else 0L
      var nextOkNs = 0L
      it.map { k =>
        val v = cache.getOrElseUpdate(k, {
          if (intervalNs > 0) {
            val now = System.nanoTime()
            if (now < nextOkNs)
              Thread.sleep((nextOkNs - now) / 1000000L + 1)
            nextOkNs = math.max(now, nextOkNs) + intervalNs
          }
          fetchWithRetry(client, s"$baseUrl?key=$k", attempts,
            baseBackoffMs, headers)
        })
        (k, v.orNull)
      }
    }.toDF("key", "value")
  }

  /** A7 composition: the keyed lookup authenticated by a [[Secrets]]
    * token, with the rotation-recovery loop — on [[AuthFailure]] the
    * task invalidates the cached secret, re-resolves `latest`, and
    * retries the partition's remaining fetches with the fresh token
    * (one refresh per failure; a second 401 with a fresh token is a
    * genuinely dead credential and fails the task). */
  def lookupWithAuth(keys: org.apache.spark.sql.Dataset[Long],
      baseUrl: String, secretRoot: String, secretName: String,
      attempts: Int = 4, baseBackoffMs: Long = 50L,
      maxRps: Double = 0d): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.mapPartitions { it =>
      val client = java.net.http.HttpClient.newHttpClient()
      val cache = scala.collection.mutable.Map.empty[Long, Option[String]]
      val intervalNs = if (maxRps > 0) (1e9 / maxRps).toLong else 0L
      var nextOkNs = 0L
      def fetch(k: Long): Option[String] = {
        if (intervalNs > 0) {
          val now = System.nanoTime()
          if (now < nextOkNs)
            Thread.sleep((nextOkNs - now) / 1000000L + 1)
          nextOkNs = math.max(now, nextOkNs) + intervalNs
        }
        def once(): Option[String] = fetchWithRetry(client,
          s"$baseUrl?key=$k", attempts, baseBackoffMs,
          Map("Authorization" ->
            s"Bearer ${Secrets.get(secretRoot, secretName)}"))
        try once()
        catch {
          case _: AuthFailure =>
            Secrets.invalidate(secretRoot, secretName)
            once() // fresh token; a second 401 propagates
        }
      }
      it.map { k => (k, cache.getOrElseUpdate(k, fetch(k)).orNull) }
    }.toDF("key", "value")
  }
}
