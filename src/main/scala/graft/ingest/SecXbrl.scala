package graft.ingest

/** One numeric fact from an XBRL instance document. */
final case class XbrlFact(
    concept: String,
    context_ref: String,
    unit_ref: Option[String],
    value: BigDecimal)

/** SEC XBRL instance parsing — the capability behind the reference's
  * dead `xml.etree` import (ethical_crawler.py:20): its SEC adapter
  * catalogs XBRL feeds (companyfacts, frames — :587–677) but never
  * parses a filing. This mapper closes that intent: an XBRL instance
  * document's numeric facts become typed rows.
  *
  * Mapper-side twin of [[graft.operators.XmlOps]]: this parses ONE
  * fetched payload on the adapter path (scala.xml, driver-side, rate
  * -limited HTTP scale); a filings CORPUS goes through `from_xml` in
  * the scan stage (XmlOps.extractFilings, executor-parallel).
  */
object SecXbrl {

  /** Extract the numeric facts: every child element carrying a
    * `contextRef` attribute whose text body parses as a number
    * (XBRL's item shape — `<us-gaap:Assets contextRef="FY23"
    * unitRef="usd">1000</us-gaap:Assets>`). Structural elements
    * (context, unit, schemaRef) carry no contextRef and fall
    * through; non-numeric (text-block) facts are skipped.
    */
  def parseFacts(xml: String): Seq[XbrlFact] = {
    val root = scala.xml.XML.loadString(xml)
    root.child.collect {
      case e: scala.xml.Elem if (e \@ "contextRef").nonEmpty &&
          scala.util.Try(BigDecimal(e.text.trim)).isSuccess =>
        XbrlFact(
          concept = e.label,
          context_ref = e \@ "contextRef",
          unit_ref = Option(e \@ "unitRef").filter(_.nonEmpty),
          value = BigDecimal(e.text.trim))
    }.toSeq
  }
}
