package graft.ingest

import java.sql.Timestamp
import java.time.{Clock, Instant, OffsetDateTime, Year, ZoneOffset}

/** The four source adapters, re-derived from the reference's field
  * ladders as PURE payload→DataRecord mappers (testable offline
  * against FIXTURES.md §B payloads) plus a thin fetch step behind
  * [[HttpFetcher]]. Rate limiting and robots checks happen before
  * every network call, exactly like the reference's
  * `respect_rate_limit`/`can_fetch` preamble.
  */
trait Adapter {
  def source: DataSource
  def apiKey: Option[String]
  def fetcher: HttpFetcher
  def clock: Clock
  def robots: RobotsChecker

  protected lazy val limiter =
    new RateLimiter(source.rate_limit_per_second)

  protected def now: Timestamp = Timestamp.from(clock.instant())

  /** Discover dataset metadata records (never content — README.txt:160
    * "Metadata only").
    */
  def discover(): Seq[DataRecord]

  /** Compliance verification (ethical_crawler.py:304–330): robots on
    * the base URL, API-key presence when required; rate/ToS compliance
    * are structural (we always space requests; official APIs).
    */
  def checkCompliance(): ComplianceCheck = {
    val robotsOk = robots.canFetch(source.base_url)
    val keyOk = !source.requires_api_key || apiKey.isDefined
    val issues =
      (if (robotsOk) Nil else List("Base URL disallowed by robots.txt")) ++
      (if (keyOk) Nil else List("API key required but not provided"))
    val recs =
      if (keyOk) Nil else List("Obtain API key from official source")
    ComplianceCheck(
      source_name = source.name,
      robots_txt_compliant = robotsOk,
      rate_limit_compliant = true,
      terms_compliant = true,
      api_key_valid = keyOk,
      last_check = now,
      issues = issues,
      recommendations = recs)
  }
}

object Adapters {

  /** F6/F7 — tolerant date parse (ethical_crawler.py:472–483):
    * all-digit string = unix seconds; else ISO-8601 with `Z`
    * accepted; unparseable → None. UTC throughout (the reference
    * uses the process-local zone; we pin UTC like the session).
    */
  def parseDate(s: Option[String]): Option[Timestamp] =
    s.filter(_.nonEmpty).flatMap { v =>
      try {
        if (v.forall(_.isDigit))
          Some(Timestamp.from(Instant.ofEpochSecond(v.toLong)))
        else
          Some(Timestamp.from(
            OffsetDateTime.parse(v.replace("Z", "+00:00")).toInstant))
      } catch { case _: Exception => None }
    }

  /** F8 — content-summary synthesis (ethical_crawler.py:453–470):
    * `" | "`-joined parts for the fields present.
    */
  def generateSummary(item: Js): String = {
    val parts = Seq(
      item("name").str.map(n => s"Dataset: $n"),
      item("category").str.map(c => s"Category: $c"),
      if (item("columns").isMissing) None
      else Some(s"Columns: ${item("columns").size}"),
      item("viewCount").long.map(v => s"Views: ${formatThousands(v)}")
    ).flatten
    parts.mkString(" | ")
  }

  /** F11 — `f"{n:,}"` thousands separators (ethical_crawler.py:468). */
  def formatThousands(n: Long): String =
    "%,d".formatLocal(java.util.Locale.US, n)
}

/** NYC Open Data (Socrata) — ethical_crawler.py:343–451. */
class NycOpenDataAdapter(
    val fetcher: HttpFetcher,
    val apiKey: Option[String] = None,
    val clock: Clock = Clock.systemUTC(),
    robotsOpt: Option[RobotsChecker] = None) extends Adapter {

  val source: DataSource = DataSource(
    name = "NYC Open Data",
    base_url = "https://data.cityofnewyork.us",
    api_endpoint = "https://data.cityofnewyork.us/api/views",
    requires_api_key = false,
    rate_limit_per_second = 1.0,
    terms_of_service_url = "https://opendata.cityofnewyork.us/overview/",
    robots_txt_url = "https://data.cityofnewyork.us/robots.txt",
    data_license = "Public Domain")

  val robots: RobotsChecker =
    robotsOpt.getOrElse(new RobotsChecker(fetcher, clock))

  /** Pure mapper: one discovery-payload item → DataRecord
    * (field ladder ethical_crawler.py:381–405).
    */
  def mapItem(item: Js): DataRecord = {
    val id = item("id").str.getOrElse("")
    DataRecord(
      source_name = source.name,
      record_id = id,
      title = item("name").str.getOrElse("Untitled Dataset"),
      description = Some(item("description").str.getOrElse("")),
      data_type = "dataset",
      url = s"https://data.cityofnewyork.us/d/$id",
      metadata = Js.render(Map(
        "category" -> item("category").str,
        "tags" -> item("tags").strings,
        "attribution" -> item("attribution").str,
        "update_frequency" -> item("updateFrequency").str,
        "columns" -> item("columns"),
        "view_count" -> item("viewCount").long.getOrElse(0L),
        "download_count" -> item("downloadCount").long.getOrElse(0L))),
      content_summary = Some(Adapters.generateSummary(item)),
      tags = item("tags").strings,
      last_updated = Adapters.parseDate(item("rowsUpdatedAt").strOrNum),
      ingested_at = now,
      file_format = Some("CSV/JSON"),
      size_bytes = None,
      license_info = Some(source.data_license))
  }

  /** Pure mapper for the per-dataset detail payload
    * (ethical_crawler.py:430–444): whole payload becomes `metadata`.
    */
  def mapDetail(datasetId: String, data: Js): DataRecord =
    mapItem(data).copy(
      record_id = datasetId,
      url = s"https://data.cityofnewyork.us/d/$datasetId",
      metadata = data.rawJson)

  override def discover(): Seq[DataRecord] = {
    limiter.acquire()
    if (!robots.canFetch(source.api_endpoint)) return Seq.empty
    val url = HttpFetcher.withParams(s"${source.api_endpoint}/metadata/v1",
      Seq("limit" -> "5000", "offset" -> "0") ++
        apiKey.map("$$app_token" -> _))
    fetcher.get(url) match {
      case Right((200, body)) => Js.parse(body).arr.map(mapItem)
      case _ => Seq.empty
    }
  }

  /** L6 — per-dataset refresh (ethical_crawler.py:416–451), the
    * last-write-wins upsert input.
    */
  def fetchDatasetMetadata(datasetId: String): Option[DataRecord] = {
    limiter.acquire()
    val url = HttpFetcher.withParams(
      s"${source.api_endpoint}/$datasetId.json",
      apiKey.map("$$app_token" -> _).toSeq)
    fetcher.get(url) match {
      case Right((200, body)) => Some(mapDetail(datasetId, Js.parse(body)))
      case _ => None
    }
  }
}

/** UN Comtrade — ethical_crawler.py:487–584. Static two-entry catalog
  * + per-endpoint metadata fetch; the `_extract_*` helpers are stubs
  * in the reference (:576–584) except the year range (:571–574).
  */
class UnComtradeAdapter(
    val fetcher: HttpFetcher,
    val apiKey: Option[String] = None,
    val clock: Clock = Clock.systemUTC(),
    robotsOpt: Option[RobotsChecker] = None) extends Adapter {

  val source: DataSource = DataSource(
    name = "UN Comtrade",
    base_url = "https://comtradeapi.un.org",
    api_endpoint = "https://comtradeapi.un.org/data/v1",
    requires_api_key = true,
    rate_limit_per_second = 0.1,
    terms_of_service_url = "https://comtradeapi.un.org/",
    robots_txt_url = "https://comtradeapi.un.org/robots.txt",
    data_license = "Creative Commons Attribution 4.0")

  val robots: RobotsChecker =
    robotsOpt.getOrElse(new RobotsChecker(fetcher, clock))

  val catalog: Seq[(String, String, String, String)] = Seq(
    ("goods", "International Trade in Goods",
      "Trade flows of goods between countries", "/goods"),
    ("services", "International Trade in Services",
      "Trade flows of services between countries", "/services"))

  /** F12 — year-range extraction (ethical_crawler.py:571–574). */
  def extractYears(metadata: Js): Seq[Int] =
    2000 to Year.now(clock).getValue

  def mapEndpoint(id: String, name: String, description: String,
      endpoint: String, metadata: Js): DataRecord =
    DataRecord(
      source_name = source.name,
      record_id = id,
      title = name,
      description = Some(description),
      data_type = "api_endpoint",
      url = s"${source.api_endpoint}$endpoint",
      metadata = Js.render(Map(
        "endpoint" -> endpoint,
        "available_years" -> extractYears(metadata).map(_.toString),
        "countries" -> Seq.empty[String],
        "products" -> Seq.empty[String])),
      content_summary = Some(s"Trade data endpoint: $name"),
      tags = Seq("trade", "international", "economics", id),
      last_updated = Some(now),
      ingested_at = now,
      file_format = Some("JSON/CSV"),
      size_bytes = None,
      license_info = Some(source.data_license))

  override def discover(): Seq[DataRecord] =
    catalog.flatMap { case (id, name, desc, endpoint) =>
      limiter.acquire()
      val headers =
        apiKey.map("Ocp-Apim-Subscription-Key" -> _).toMap
      fetcher.get(s"${source.api_endpoint}$endpoint/metadata",
          headers) match {
        case Right((200, body)) =>
          Some(mapEndpoint(id, name, desc, endpoint, Js.parse(body)))
        case _ => None
      }
    }
}

/** SEC EDGAR — ethical_crawler.py:587–677. Static three-feed catalog;
  * availability via HEAD probe where 200 AND 404 both count as
  * accessible (:644 — 404 is fine for the test endpoint).
  */
class SecEdgarAdapter(
    val fetcher: HttpFetcher,
    val clock: Clock = Clock.systemUTC(),
    robotsOpt: Option[RobotsChecker] = None) extends Adapter {

  val apiKey: Option[String] = None

  val source: DataSource = DataSource(
    name = "SEC EDGAR",
    base_url = "https://www.sec.gov",
    api_endpoint = "https://data.sec.gov/api/xbrl",
    requires_api_key = false,
    rate_limit_per_second = 0.1,
    terms_of_service_url = "https://www.sec.gov/privacy",
    robots_txt_url = "https://www.sec.gov/robots.txt",
    data_license = "Public Domain")

  val robots: RobotsChecker =
    robotsOpt.getOrElse(new RobotsChecker(fetcher, clock))

  val feeds: Seq[(String, String, String, String)] = Seq(
    ("company_facts", "Company Facts", "XBRL facts for all companies",
      "https://data.sec.gov/api/xbrl/companyfacts.zip"),
    ("submissions", "Company Submissions",
      "All company filings metadata", "https://data.sec.gov/submissions/"),
    ("mutual_fund_prospectus", "Mutual Fund Prospectus",
      "Mutual fund and ETF prospectus summaries",
      "https://data.sec.gov/api/xbrl/frames/"))

  def mapFeed(id: String, name: String, description: String, url: String)
      : DataRecord =
    DataRecord(
      source_name = source.name,
      record_id = id,
      title = name,
      description = Some(description),
      data_type = "data_feed",
      url = url,
      metadata = Js.render(Map(
        "feed_type" -> id,
        "format" -> "JSON/ZIP",
        "update_frequency" -> "Daily")),
      content_summary = Some(s"SEC data feed: $name"),
      tags = Seq("sec", "financial", "filings", "xbrl"),
      last_updated = Some(now),
      ingested_at = now,
      file_format = Some("JSON/ZIP"),
      size_bytes = None,
      license_info = Some(source.data_license))

  override def discover(): Seq[DataRecord] =
    feeds.flatMap { case (id, name, desc, url) =>
      limiter.acquire()
      val probeUrl =
        if (id == "submissions") url + "CIK0000320193.json" else url
      val headers = Map(
        "User-Agent" -> "Research Institution compliance@university.edu",
        "Accept-Encoding" -> "gzip, deflate")
      fetcher.head(probeUrl, headers) match {
        case Right(status) if status == 200 || status == 404 =>
          Some(mapFeed(id, name, desc, url))
        case _ => None
      }
    }
}

/** College Scorecard — ethical_crawler.py:682–771. Requires API key;
  * discovery is a 1-row probe of `/schools` recording the total count
  * and the documented field list (:761–771).
  */
class CollegeScorecardAdapter(
    val fetcher: HttpFetcher,
    val apiKey: Option[String],
    val clock: Clock = Clock.systemUTC(),
    robotsOpt: Option[RobotsChecker] = None) extends Adapter {

  val source: DataSource = DataSource(
    name = "College Scorecard",
    base_url = "https://api.data.gov",
    api_endpoint = "https://api.data.gov/ed/collegescorecard/v1",
    requires_api_key = true,
    rate_limit_per_second = 1.0,
    terms_of_service_url = "https://api.data.gov/terms/",
    robots_txt_url = "https://api.data.gov/robots.txt",
    data_license = "Public Domain")

  val robots: RobotsChecker =
    robotsOpt.getOrElse(new RobotsChecker(fetcher, clock))

  val availableFields: Seq[String] = Seq(
    "school.name", "school.city", "school.state", "school.zip",
    "school.school_url", "school.price_calculator_url",
    "admissions.admission_rate.overall", "student.size",
    "cost.tuition.in_state", "cost.tuition.out_of_state",
    "aid.median_debt.completers.overall",
    "completion.completion_rate_4yr_150nt",
    "earnings.10_yrs_after_entry.median")

  def mapEndpoint(payload: Js): DataRecord =
    DataRecord(
      source_name = source.name,
      record_id = "schools",
      title = "School Data",
      description = Some("College and university data including " +
        "academics, admissions, aid, cost, completion, earnings, " +
        "and student body"),
      data_type = "api_endpoint",
      url = s"${source.api_endpoint}/schools",
      metadata = Js.render(Map(
        "endpoint" -> "/schools",
        "total_schools" ->
          payload("metadata")("total").long.getOrElse(0L),
        "available_fields" -> availableFields)),
      content_summary = Some("College data endpoint: School Data"),
      tags = Seq("education", "college", "university", "scorecard"),
      last_updated = Some(now),
      ingested_at = now,
      file_format = Some("JSON"),
      size_bytes = None,
      license_info = Some(source.data_license))

  override def discover(): Seq[DataRecord] = {
    if (apiKey.isEmpty) return Seq.empty
    limiter.acquire()
    val url = HttpFetcher.withParams(s"${source.api_endpoint}/schools",
      Seq("api_key" -> apiKey.get, "_per_page" -> "1",
        "_fields" -> "id,school.name"))
    fetcher.get(url) match {
      case Right((200, body)) => Seq(mapEndpoint(Js.parse(body)))
      case _ => Seq.empty
    }
  }
}
