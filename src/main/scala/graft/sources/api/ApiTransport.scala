package graft.sources.api

import java.util.concurrent.ConcurrentHashMap

/** Transport abstraction for the web-API source (SURVEY.md §2.1 S1/S2).
  *
  * The reference fetches with `requests.get(url, headers={Authorization})`
  * (mabna_tables_create.py:46-67). This engine never blocks on live HTTP
  * in tests or CI (zero-egress environment — SURVEY.md §7.4): transports
  * are injectable, and the DSv2 source looks its transport up by name so
  * the only thing crossing Spark's string-only option map is a registry
  * key.
  *
  * `fetch` returns the raw JSON body for one endpoint page. Incremental
  * reads pass the watermark through `params` exactly like the reference
  * (`meta.version={wm}&meta.version_op=gt` — constants.yaml:7-9).
  */
trait ApiTransport extends Serializable {
  def fetch(endpoint: String, params: Map[String, String]): String
}

/** HTTP transport for live deployments: java.net.http (JDK 11+), bearer
  * token from the environment like the reference's TOKEN env var
  * (mabna_tables_create.py:15). Never exercised in tests. */
final class HttpTransport(baseUrl: String, tokenEnv: String = "GRAFT_API_TOKEN")
    extends ApiTransport {
  @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
  override def fetch(endpoint: String, params: Map[String, String]): String = {
    val builder = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(HttpTransport.buildUrl(baseUrl, endpoint, params)))
    sys.env.get(tokenEnv).foreach(t => builder.header("Authorization", t))
    client.send(builder.GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
  }
}

object HttpTransport {
  /** Fan-out endpoints may already carry a query string
    * (`exchange/trades?instrument.type=share` — the reference appends
    * further params with '&', mabna_tables_create.py:49,86), so the
    * separator before the param string depends on the endpoint. */
  def buildUrl(baseUrl: String, endpoint: String,
               params: Map[String, String]): String = {
    val qs = params.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" +
        java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val sep =
      if (qs.isEmpty) ""
      else if (endpoint.contains("?")) "&"
      else "?"
    s"$baseUrl/$endpoint$sep$qs"
  }
}

/** Process-local transport registry: DSv2 options are strings, so the
  * reader resolves its transport by name at planning time. Executors in
  * local mode share the JVM; on a cluster a named transport must be
  * constructible on the executor (register a factory in a static block
  * of the application jar). */
object TransportRegistry {
  private val transports = new ConcurrentHashMap[String, ApiTransport]()
  def register(name: String, t: ApiTransport): Unit = transports.put(name, t)
  def get(name: String): ApiTransport = {
    val t = transports.get(name)
    require(t != null, s"no ApiTransport registered under '$name'")
    t
  }
}
