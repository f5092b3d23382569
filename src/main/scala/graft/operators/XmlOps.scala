package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.Sorting.ResultSortOps

/** STRUCTURED-FILING (XML/XBRL) EXTRACTION — the capability the
  * reference imports `xml.etree` for and never exercises
  * (ethical_crawler.py:20; SURVEY dead-import inventory): parse an
  * SEC-style XML filing payload into typed columns, relationally.
  *
  * Spark-first shape: the payload column goes through the engine's
  * NATIVE `from_xml` expression (Spark 4 ships the XML source in
  * core) against a typed schema — attributes, nested elements and
  * repeated `<fact>` arrays land as struct/array columns in ONE
  * codegen'd projection, then `explode` + aggregate are ordinary
  * relational algebra. No driver-side DOM walking, no UDF: the parse
  * runs inside the scan stage on every executor, which is the 100 TB
  * shape for a filings corpus.
  *
  * The x1 fixture payload is RENDERED from the documents table
  * (integer facts only), so the whole render→parse→explode→aggregate
  * loop is oracle-exact: DuckDB computes the same rollup straight
  * from the base table, proving the parser round-trip the same way
  * m2 proves the PNG codec round-trip.
  */
object XmlOps {

  /** XBRL-ish filing document per row: cik attribute, entity/period
    * elements, repeated `<fact name value/>` elements. Values are
    * integers and the embedded strings are alphanumeric table codes,
    * so rendering needs no XML escaping (asserted in the spec).
    */
  def filingPayload(docs: DataFrame): DataFrame =
    docs.select(concat(
      lit("<filing cik=\""), col("doc_id"),
      lit("\"><entity>"), col("source"),
      lit("</entity><period>"), col("lang"),
      lit("</period><fact name=\"Chars\" value=\""), col("n_chars"),
      lit("\"/><fact name=\"Tokens\" value=\""),
      size(split(col("text"), " ")).cast("long"),
      lit("\"/></filing>")).as("payload"))

  /** Typed schema of one filing: `_`-prefixed fields are XML
    * attributes (Spark's default attributePrefix).
    */
  val FilingSchema: StructType = StructType.fromDDL(
    "_cik BIGINT, entity STRING, period STRING, " +
      "fact ARRAY<STRUCT<_name: STRING, _value: BIGINT>>")

  /** Parse filing payloads and roll facts up per (entity, fact
    * name): fact count and value total — the frames-style rollup an
    * XBRL consumer runs. Bounded output (|sources| × |fact names|),
    * so the final sort is the single-partition result sort.
    */
  def extractFilings(payloads: DataFrame): DataFrame =
    payloads
      .select(from_xml(col("payload"), FilingSchema).as("f"))
      .select(col("f.entity").as("entity"),
        explode(col("f.fact")).as("fact"))
      .select(col("entity"), col("fact._name").as("fact_name"),
        col("fact._value").as("fact_value"))
      .groupBy(col("entity"), col("fact_name"))
      .agg(count(lit(1)).as("n_facts"),
        sum(col("fact_value")).as("total_value"))
      .resultSorted(col("entity").asc, col("fact_name").asc)

  /** Oracle twin of [[filingPayload]] ∘ [[extractFilings]]: the same
    * rollup straight off the base table — parse(render(x)) must be
    * the identity for the embedded facts.
    */
  def extractFilingsSql(table: String): String =
    s"""WITH facts AS (
       |  SELECT source AS entity, 'Chars' AS fact_name,
       |         n_chars AS fact_value
       |  FROM $table
       |  UNION ALL
       |  SELECT source, 'Tokens',
       |         len(string_split(text, ' '))::BIGINT
       |  FROM $table)
       |SELECT entity, fact_name, count(*) AS n_facts,
       |  sum(fact_value)::BIGINT AS total_value
       |FROM facts GROUP BY entity, fact_name
       |ORDER BY entity ASC, fact_name ASC""".stripMargin
}
