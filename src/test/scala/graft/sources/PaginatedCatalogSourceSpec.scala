package graft.sources

import graft.SparkSpec
import graft.ingest.HttpFetcher

/** Offline SEC submissions fixture: one public-contract-shaped JSON
  * document per CIK URL (columnar `filings.recent` arrays), 3 recent
  * filings each. Constructed BY CLASS NAME inside each partition
  * reader; records the last headers seen so the spec can assert the
  * polite-crawler UA reached the transport.
  */
class SecSubmissionsFixtureFetcher extends HttpFetcher {
  override def get(url: String, headers: Map[String, String])
      : Either[String, (Int, String)] = {
    SecSubmissionsFixtureFetcher.lastHeaders.set(headers)
    val cik10 = url.split("CIK").last.stripSuffix(".json")
    if (cik10.length != 10) return Right((404, "bad CIK"))
    val cik = cik10.dropWhile(_ == '0')
    val body =
      s"""{"cik": $cik, "name": "Registrant $cik", "filings": {"recent": {
         |"accessionNumber": ["$cik-24-000001", "$cik-24-000002", "$cik-23-000009"],
         |"form": ["10-K", "8-K", "10-Q"],
         |"filingDate": ["2024-11-01", "2024-08-05", "2023-05-02"],
         |"primaryDocument": ["a.htm", "b.htm", "c.htm"]}}}"""
        .stripMargin.replaceAll("\n", " ")
    Right((200, body))
  }
  override def head(url: String, headers: Map[String, String])
      : Either[String, Int] = Right(200)
}

object SecSubmissionsFixtureFetcher {
  val lastHeaders = new java.util.concurrent.atomic.AtomicReference[
    Map[String, String]](Map.empty)
}

/** Offline Comtrade metadata fixture (the unauthenticated surface). */
class ComtradeFixtureFetcher extends HttpFetcher {
  override def get(url: String, headers: Map[String, String])
      : Either[String, (Int, String)] =
    Right((200, """{"lastUpdated": "2024-01-01"}"""))
  override def head(url: String, headers: Map[String, String])
      : Either[String, Int] = Right(200)
}

/** Offline Scorecard pages: 5 schools at 2/page; records the last
  * URL so the spec can assert the api_key/per_page params reached
  * the transport.
  */
class ScorecardFixtureFetcher extends HttpFetcher {
  override def get(url: String, headers: Map[String, String])
      : Either[String, (Int, String)] = {
    ScorecardFixtureFetcher.lastUrl.set(url)
    val q = url.dropWhile(_ != '?').drop(1).split("&")
      .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
    val page = q("page").toInt
    val per = q("per_page").toInt
    val total = 5
    val items = (page * per until math.min(page * per + per, total))
      .map { i =>
        s"""{"id": "sc-$i", "school.name": "School $i",
           |"school.city": "City$i", "school.state": "NY",
           |"school.school_url": "https://school$i.edu"}"""
          .stripMargin.replaceAll("\n", " ")
      }
    Right((200, items.mkString("""{"results": [""", ",", "]}")))
  }
  override def head(url: String, headers: Map[String, String])
      : Either[String, Int] = Right(200)
}

object ScorecardFixtureFetcher {
  val lastUrl = new java.util.concurrent.atomic.AtomicReference[String]("")
}

class PaginatedCatalogSourceSpec extends SparkSpec {

  private def readSec(items: String) =
    spark.read.format(classOf[PaginatedCatalogSource].getName)
      .option("items", items)
      .option("endpoint", "http://fixture/submissions")
      .option("mapperClass", classOf[SecSubmissionsPageMapper].getName)
      .option("fetcherClass",
        classOf[SecSubmissionsFixtureFetcher].getName)
      .option("ratePerSecond", 1e6)
      .load()

  test("one InputPartition per CIK work item; filings map to records") {
    val df = readSec("320193,789019")
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.select("record_id", "title", "url", "data_type")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2), r.getString(3))).sortBy(_._1).toSeq
    assert(rows.length == 6) // 3 recent filings per registrant
    assert(rows.map(_._4).distinct == Seq("filing"))
    val tenK = rows.find(_._1 == "320193-24-000001").get
    assert(tenK._2 == "Registrant 320193 10-K")
    // Archives URL: CIK un-padded, accession de-dashed, primary doc
    assert(tenK._3 ==
      "https://www.sec.gov/Archives/edgar/data/320193/32019324000001/a.htm")
    // the polite-crawler UA reached the transport
    assert(SecSubmissionsFixtureFetcher.lastHeaders.get()
      .get("User-Agent").exists(_.contains("compliance@university.edu")))
  }

  test("form tags and filing dates survive the mapper") {
    val df = readSec("320193")
    import org.apache.spark.sql.functions.col
    val row = df.filter(col("record_id") === "320193-24-000002")
      .select("tags", "last_updated", "metadata").head()
    assert(row.getSeq[String](0) == Seq("sec", "filing", "8-k"))
    assert(row.getTimestamp(1).toInstant ==
      java.time.Instant.parse("2024-08-05T00:00:00Z"))
    assert(row.getString(2).contains("\"form\": \"8-K\""))
  }

  test("CIK pads to 10 digits in the submissions URL") {
    val m = new SecSubmissionsPageMapper
    assert(m.pageUrl("https://data.sec.gov/submissions", "320193", 100)
      == "https://data.sec.gov/submissions/CIK0000320193.json")
  }

  test("Comtrade: one partition per catalog entry through the shared " +
      "adapter mapper") {
    val df = spark.read.format(classOf[PaginatedCatalogSource].getName)
      .option("items", "goods,services")
      .option("endpoint", "http://fixture/data/v1")
      .option("mapperClass", classOf[ComtradeCatalogPageMapper].getName)
      .option("fetcherClass", classOf[ComtradeFixtureFetcher].getName)
      .option("ratePerSecond", 1e6)
      .load()
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.select("record_id", "title", "url", "data_type")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).sortBy(_._1).toSeq
    assert(rows.map(_._1) == Seq("goods", "services"))
    assert(rows.head._2 == "International Trade in Goods")
    assert(rows.head._3 == "https://comtradeapi.un.org/data/v1/goods")
  }

  test("Scorecard: offset pages fan out; one record per school") {
    val df = spark.read.format(classOf[PaginatedCatalogSource].getName)
      .option("pages", 3)
      .option("pageSize", 2)
      .option("endpoint", "http://fixture/v1/schools?api_key=TESTKEY")
      .option("mapperClass", classOf[ScorecardPageMapper].getName)
      .option("fetcherClass", classOf[ScorecardFixtureFetcher].getName)
      .option("ratePerSecond", 1e6)
      .load()
    assert(df.rdd.getNumPartitions == 3)
    val rows = df.select("record_id", "title", "metadata")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getString(2))).sortBy(_._1).toSeq
    assert(rows.length == 5) // 2 + 2 + 1 schools
    assert(rows.head._2 == "School 0")
    assert(rows.head._3.contains("\"state\": \"NY\""))
    // the api_key query param survived into the page URL
    assert(ScorecardFixtureFetcher.lastUrl.get().contains("api_key=TESTKEY"))
    assert(ScorecardFixtureFetcher.lastUrl.get().contains("per_page=2"))
  }

  test("globalRatePerSecond divides the budget by planned concurrency") {
    import PaginatedCatalogSource.perPartitionRate
    // 10^6-CIK work-list on 16 cores at SEC's 10 req/s budget:
    // 16 concurrent readers share the budget, not multiply it.
    assert(perPartitionRate(10.0, 1000000, 16) == 10.0 / 16)
    // fewer items than cores: concurrency is the work-list size
    assert(perPartitionRate(10.0, 3, 16) == 10.0 / 3)
    assert(perPartitionRate(1.0, 0, 16) == 1.0) // degenerate floor
    intercept[IllegalArgumentException](perPartitionRate(0.0, 5, 16))
    // end-to-end: the option plans and reads (budget generous enough
    // that the fixture read stays instant)
    val df = spark.read.format(classOf[PaginatedCatalogSource].getName)
      .option("items", "320193,789019")
      .option("endpoint", "http://fixture/submissions")
      .option("mapperClass", classOf[SecSubmissionsPageMapper].getName)
      .option("fetcherClass",
        classOf[SecSubmissionsFixtureFetcher].getName)
      .option("globalRatePerSecond", 1e6)
      .load()
    assert(df.count() == 6)
  }

  test("missing work-list fails loudly (no silent single page)") {
    val ex = intercept[Exception] {
      spark.read.format(classOf[PaginatedCatalogSource].getName)
        .option("endpoint", "http://fixture/x")
        .option("mapperClass", classOf[SecSubmissionsPageMapper].getName)
        .load().count()
    }
    assert(ex.getMessage.contains("pages"))
  }
}
