package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

/** A7 integration closure — the secret-fetch edge.
  *
  * The reference resolves its API token from Secret Manager at function
  * start (`api_to_gcs/main.py:35-47` — `secretmanager.
  * SecretManagerServiceClient().access_secret_version` on a
  * `projects/p/secrets/name/versions/latest` path) and caches the client
  * for the life of the instance. The engine models the same contract on
  * the sandbox's only durable store: a directory of versioned secret
  * files — the volume-mounted form real deployments use when no manager
  * is reachable — with the manager's semantics kept intact:
  *
  *  - `<root>/<name>/versions/<N>` holds version N's payload;
  *    `<root>/<name>/latest` names the current version (the manager's
  *    `latest` alias);
  *  - [[get]] resolves `latest` THEN caches per (name, resolved
  *    version) — exactly once per JVM per version, the reference's
  *    instance-cache shape (a 1000-executor cluster fetches each secret
  *    once per executor, never per row or per task);
  *  - rotation is a NEW version + alias flip; a cached reader keeps the
  *    old payload until [[invalidate]] — which is what the 401-driven
  *    refetch in [[HttpDim.lookupWithAuth]] calls, the token-expiry
  *    recovery loop every OAuth-ish edge needs.
  *
  * Payloads never touch Spark rows or logs; the provider hands the
  * value to the HTTP header builder and nothing else. */
object Secrets {
  private val cache = new ConcurrentHashMap[(String, String, String), String]()
  // the `latest` alias is itself resolved ONCE per JVM — the whole point
  // of the instance cache is that rotation does NOT propagate until a
  // 401 (or an explicit invalidate) forces a re-resolve
  private val aliasCache = new ConcurrentHashMap[(String, String), String]()

  private def read(p: Path): String =
    new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim

  /** Resolve `version` ("latest" or an explicit "N") of `name` under
    * `root`. Both the alias resolution and the payload are cached —
    * exactly once per JVM per version; a missing secret or version
    * fails loudly — an absent credential must never become an empty
    * header. */
  def get(root: String, name: String, version: String = "latest"): String = {
    val dir = Paths.get(root, name)
    val resolved =
      if (version == "latest")
        aliasCache.computeIfAbsent((root, name), _ => read(dir.resolve("latest")))
      else version
    cache.computeIfAbsent((root, name, resolved), { _ =>
      val p = dir.resolve("versions").resolve(resolved)
      require(Files.exists(p), s"secret $name version $resolved absent under $root")
      read(p)
    })
  }

  /** Drop every cached version AND the alias resolution of `name` — the
    * rotation hook. The next [[get]] re-resolves `latest` from disk. */
  def invalidate(root: String, name: String): Unit = {
    aliasCache.remove((root, name))
    val it = cache.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1 == root && k._2 == name) it.remove()
    }
  }

  /** Test/demo helper: write `value` as version `n` and flip `latest`. */
  def put(root: String, name: String, n: Int, value: String): Unit = {
    val dir = Paths.get(root, name)
    Files.createDirectories(dir.resolve("versions"))
    Files.write(dir.resolve("versions").resolve(n.toString),
      value.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("latest"),
      n.toString.getBytes(StandardCharsets.UTF_8))
  }
}
