package graft.ingest

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** HTTP boundary, pluggable so every mapper and checker is testable
  * offline (the container has zero egress; unit tests inject fixture
  * fetchers). The JDK client is the only HTTP client available —
  * `build.sbt` resolves nothing beyond Spark's jars.
  */
trait HttpFetcher {

  /** GET returning (status, body); Left(message) on transport error. */
  def get(url: String, headers: Map[String, String] = Map.empty)
      : Either[String, (Int, String)]

  /** HEAD returning status; Left(message) on transport error
    * (SEC availability probe, ethical_crawler.py:643).
    */
  def head(url: String, headers: Map[String, String] = Map.empty)
      : Either[String, Int]
}

object HttpFetcher {

  /** Query-string assembly (the reference passes params dicts to
    * aiohttp, e.g. ethical_crawler.py:369–374).
    */
  def withParams(url: String, params: Seq[(String, String)]): String =
    if (params.isEmpty) url
    else {
      val qs = params.map { case (k, v) =>
        URLEncoder.encode(k, StandardCharsets.UTF_8) + "=" +
          URLEncoder.encode(v, StandardCharsets.UTF_8)
      }.mkString("&")
      url + (if (url.contains("?")) "&" else "?") + qs
    }
}

/** Production fetcher: java.net.http with the reference's timeouts
  * (30 s session, ethical_crawler.py:281) and identifying UA (:283).
  */
final class JdkHttpFetcher(
    timeout: Duration = Duration.ofSeconds(30),
    userAgent: String =
      "EthicalDataBot/1.0 (Responsible Research Data Collection)")
    extends HttpFetcher {

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(timeout)
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private def request(url: String, headers: Map[String, String]) = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
      .header("User-Agent", userAgent)
      .header("Accept",
        "application/json, application/xml, text/csv, text/html")
    headers.foreach { case (k, v) => b.setHeader(k, v) }
    b
  }

  override def get(url: String, headers: Map[String, String])
      : Either[String, (Int, String)] =
    try {
      val resp = client.send(request(url, headers).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      Right((resp.statusCode(), resp.body()))
    } catch { case e: Exception => Left(e.getMessage) }

  override def head(url: String, headers: Map[String, String])
      : Either[String, Int] =
    try {
      val resp = client.send(
        request(url, headers)
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.discarding())
      Right(resp.statusCode())
    } catch { case e: Exception => Left(e.getMessage) }
}

/** Offline fetcher serving canned (status, body) per URL — test + CI
  * path; unknown URLs behave as transport failures.
  */
final class FixtureFetcher(
    gets: Map[String, (Int, String)],
    heads: Map[String, Int] = Map.empty) extends HttpFetcher {
  var requested: List[String] = Nil

  override def get(url: String, headers: Map[String, String])
      : Either[String, (Int, String)] = {
    requested = url :: requested
    gets.get(url).toRight(s"no fixture for GET $url")
  }

  override def head(url: String, headers: Map[String, String])
      : Either[String, Int] = {
    requested = url :: requested
    heads.get(url).toRight(s"no fixture for HEAD $url")
  }
}
