package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the HTML→text tier: extraction semantics the
  * DuckDB oracle twin can't articulate (it proves Spark≡DuckDB on the
  * same chain; these prove the chain itself does the right thing).
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extractOne(html: String): String =
    Seq(html).toDF("h")
      .select(HtmlOps.htmlToText(col("h")).as("t"))
      .head().getString(0)

  test("tag strip, entity decode, and whitespace collapse") {
    assert(extractOne("<p>one</p> <p>two &amp; three</p>") ==
      "one two & three")
    assert(extractOne("<div  class=\"x\">a</div><br/>b") == "a b")
    assert(extractOne("&lt;b&gt; &quot;q&quot; it&#39;s") ==
      "<b> \"q\" it's")
  }

  test("script and style bodies are removed WITH their content") {
    assert(extractOne(
      "a<script>var x = 1 < 2 && y > 3;</script>b") == "a b")
    assert(extractOne("a<style>body { color: #222; }</style>b") == "a b")
    // a raw '<' inside a script must not desync the tag pass
    assert(extractOne(
      "<p>keep</p><script type=\"text/js\">if (a<b) {}</script><p>also</p>")
      == "keep also")
  }

  test("decode runs AFTER tag strip: entity-encoded tags survive as text") {
    assert(extractOne("<p>&lt;i&gt;literal&lt;/i&gt;</p>") ==
      "<i>literal</i>")
    // and &amp; decodes last, so &amp;lt; cannot double-decode
    assert(extractOne("&amp;lt;") == "&lt;")
  }

  test("rendered fixture round-trips: body text survives extraction") {
    val docs = graft.Tables.documents(spark, sfSmoke).limit(20)
    val rows = docs.select(col("doc_id"), col("text"),
        HtmlOps.htmlToText(HtmlOps.renderHtml).as("extracted"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (text, ex) = (r.getString(1), r.getString(2))
      assert(ex.contains(text), s"doc ${r.get(0)}: body text lost")
      assert(!ex.contains("var x"), "script content leaked")
      assert(!ex.contains("color:"), "style content leaked")
      assert(!ex.contains("&amp;"), "entity left undecoded")
      assert(ex.contains("Fish & chips <i>"),
        "entity paragraph not decoded in order")
    }
  }

  test("title and heading blocks extract decoded") {
    val docs = graft.Tables.documents(spark, sfSmoke).limit(5)
    val rendered = docs.select(col("doc_id"), col("source"),
      HtmlOps.renderHtml.as("html"))
    val rows = HtmlOps.htmlExtract(rendered, "doc_id", "html").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1).startsWith(s"Doc $id & src"),
        s"title wrong: ${r.getString(1)}")
      assert(r.getString(2) == s"Entry $id",
        s"heading wrong: ${r.getString(2)}")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
  }

  test("linkReport: harvests every href; self links grow distinct targets") {
    val df = Seq(
      ("s1", """<a href="/">x</a><a href="/d/1?b=2">y</a>"""),
      ("s1", """<a href="/">x</a><a href="/d/2?b=2">y</a>"""),
      ("s2", """<p>no links</p>""")).toDF("source", "html")
    val rows = HtmlOps.linkReport(df, "html", "source").collect()
    val s1 = rows.find(_.getString(0) == "s1").get
    assert(s1.getLong(1) == 4)       // 2 links per doc
    assert(s1.getLong(2) == 3)       // "/" shared, self links distinct
    assert(s1.getString(3) == "/")
    assert(!rows.exists(_.getString(0) == "s2")) // no links → no row
  }

  test("frontier: crawled pages drop, nav + off-site targets remain") {
    val df = Seq(
      (1L, """<a href="/">n</a><a href="/d/1?b=2&a=1">self</a>""" +
        """<a href="/d/2#frag">peer</a>""" +
        """<a href="https://mirror.example/d/1">m</a>"""),
      (2L, """<a href="/">n</a><a href="/d/9">gone</a>"""))
      .toDF("doc_id", "html")
    val rows = HtmlOps.frontier(df, "doc_id", "html")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSeq
    // crawled = {/d/1, /d/2}: the self link (query stripped) and the
    // peer link (fragment stripped) both die; /d/9 is frontier
    assert(rows == Seq(
      ("", 2L, "/", "/d/9"),
      ("mirror.example", 1L, "https://mirror.example/d/1",
        "https://mirror.example/d/1")))
  }

  test("frontier on the fixture: mirror host grows with the corpus") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val n = docs.count()
    val rendered = docs.select(col("doc_id"),
      HtmlOps.renderHtml.as("html"))
    val rows = HtmlOps.frontier(rendered, "doc_id", "html").collect()
    val rel = rows.find(_.getString(0) == "").get
    assert(rel.getLong(1) == 2L) // "/" and "/docs": bounded nav set
    val mirror = rows.find(_.getString(0) == "mirror.example").get
    assert(mirror.getLong(1) == n,
      "every corpus page contributes one un-crawled mirror URL")
  }

  test("extraction is a pure projection: no exchange before the sort") {
    val docs = graft.Tables.documents(spark, sfSmoke)
    val ext = docs.select(col("doc_id"),
      HtmlOps.htmlToText(HtmlOps.renderHtml).as("text"))
    ext.write.format("noop").mode("overwrite").save()
    val plan = ext.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"extraction must stay in the scan stage:\n$plan")
  }
}
