package graft

import graft.ingest.{FixtureFetcher, NycOpenDataAdapter}
import java.time.{Clock, Instant, ZoneOffset}

/** Runnable tour of the client facade over offline fixtures:
  * `sbt "runMain graft.Demo"`. Mirrors the reference CLI session a
  * switching user would run (setup → collect → search → analytics →
  * status → export), rendering with the console sink.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(4)
    val clock =
      Clock.fixed(Instant.parse("2026-01-01T00:00:00Z"), ZoneOffset.UTC)
    val dir = java.nio.file.Files.createTempDirectory("graft-demo")
      .toString

    def item(id: String, name: String, cat: String, views: Int) =
      s"""{"id": "$id", "name": "$name", "description": "about $name",
         |"category": "$cat", "tags": ["demo", "${cat.toLowerCase}"],
         |"viewCount": $views, "rowsUpdatedAt": "1718000000"}"""
        .stripMargin
    val base = "https://data.cityofnewyork.us"
    val adapter = new NycOpenDataAdapter(new FixtureFetcher(Map(
      s"$base/robots.txt" -> (404, ""),
      s"$base/api/views/metadata/v1?limit=5000&offset=0" -> (200, Seq(
        item("tv-01", "Traffic Volume Counts", "Transport", 12345),
        item("bk-02", "Bike Counts", "Transport", 678),
        item("aq-03", "Air Quality Surveys", "Environment", 999))
        .mkString("[", ",", "]")))), None, clock)

    val g = new Graft(spark, dir)
    println(s"== setup: ${g.setup(Seq(adapter)).size} compliance checks")
    println(s"== collect: ${g.collect(Seq(adapter))} new records")
    println("\n== search 'counts' ==")
    println(Render.table(g.search(Some("counts"))
      .select("record_id", "title", "data_type", "license_info")))
    println("\n== analytics: type counts ==")
    println(Render.table(g.analytics()("type_counts")))
    println("\n== analytics: popular tags ==")
    println(Render.table(g.analytics()("popular_tags")))
    println("\n== status ==")
    println(Render.table(g.status()))
    println("\n== export (data_type = 'dataset') → parquet ==")
    println(Render.table(g.export(Some("data_type = 'dataset'"),
      "parquet", s"$dir/export")))
    spark.stop()
  }
}
