package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class XmlSpec extends SparkSpec {
  import spark.implicits._

  test("extractFilings: attributes, nested elements and repeated " +
      "facts land typed; malformed payloads yield null structs") {
    val payloads = Seq(
      "<filing cik=\"7\"><entity>srcA</entity><period>en</period>" +
        "<fact name=\"Chars\" value=\"10\"/>" +
        "<fact name=\"Tokens\" value=\"3\"/></filing>",
      "<filing cik=\"8\"><entity>srcA</entity><period>de</period>" +
        "<fact name=\"Chars\" value=\"5\"/></filing>",
      "this is not xml at all <<<").toDF("payload")
    val out = XmlOps.extractFilings(payloads)
      .as[(String, String, Long, Long)].collect().toSeq
    // the malformed row parses to a null struct and contributes no
    // facts; the two well-formed filings roll up per (entity, name)
    assert(out == Seq(
      ("srcA", "Chars", 2L, 15L),
      ("srcA", "Tokens", 1L, 3L)))
  }

  test("x1 round-trip: parse(render(docs)) equals the direct rollup") {
    val docs = Tables.documents(spark, sfSmoke)
    // render→parse→rollup
    val viaXml = XmlOps.extractFilings(XmlOps.filingPayload(docs))
      .as[(String, String, Long, Long)].collect().toSeq
    // direct rollup, no XML in the loop
    val direct = docs.select(col("source").as("entity"),
        col("n_chars").as("chars"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("entity"))
      .agg(count(lit(1)).as("n"), sum(col("chars")).as("sc"),
        sum(col("toks")).as("st"))
      .collect().flatMap { r =>
        Seq((r.getString(0), "Chars", r.getLong(1), r.getLong(2)),
          (r.getString(0), "Tokens", r.getLong(1), r.getLong(3)))
      }.sortBy(t => (t._1, t._2)).toSeq
    assert(viaXml == direct && viaXml.nonEmpty)
    // fixture strings are XML-safe by construction — no escaping in
    // the renderer, so prove nothing needs it
    val unsafe = docs.filter(col("source").rlike("[<>&'\"]") ||
      col("lang").rlike("[<>&'\"]")).count()
    assert(unsafe == 0L)
  }
}
