package graft.ingest

import java.sql.Timestamp

/** The engine's data model — Scala mirrors of the reference's three
  * record types (SURVEY §1.1; FIXTURES.md §A).
  *
  * Divergence by design: the surrogate `id` SEQUENCE columns
  * (ethical_crawler.py:827, :855) are dropped — the real key of
  * `data_records` is `(source_name, record_id)` (UNIQUE at :843) and
  * Spark has no sequence; see SURVEY §2.8 F2.
  */

/** Central metadata tuple (ethical_crawler.py:164–180). `metadata` is
  * kept as a raw JSON string for round-trip fidelity (written with
  * json.dumps at :928, read with json.loads at :1022); typed access
  * goes through `from_json`/`get_json_object` on demand.
  * `embedding` is the L1 extension column (declared FLOAT[] at :842,
  * never populated by the reference).
  */
final case class DataRecord(
    source_name: String,
    record_id: String,
    title: String,
    description: Option[String],
    data_type: String,
    url: String,
    metadata: String,
    content_summary: Option[String],
    tags: Seq[String],
    last_updated: Option[Timestamp],
    ingested_at: Timestamp,
    file_format: Option[String],
    size_bytes: Option[Long],
    license_info: Option[String],
    embedding: Option[Seq[Float]] = None)

/** Source-registry entry (ethical_crawler.py:148–161). */
final case class DataSource(
    name: String,
    base_url: String,
    api_endpoint: String,
    requires_api_key: Boolean,
    rate_limit_per_second: Double,
    terms_of_service_url: String,
    robots_txt_url: String,
    data_license: String,
    last_checked: Option[Timestamp] = None,
    is_compliant: Boolean = true,
    compliance_notes: Option[String] = None)

/** Append-only compliance audit record (ethical_crawler.py:183–193). */
final case class ComplianceCheck(
    source_name: String,
    robots_txt_compliant: Boolean,
    rate_limit_compliant: Boolean,
    terms_compliant: Boolean,
    api_key_valid: Boolean,
    last_check: Timestamp,
    issues: Seq[String],
    recommendations: Seq[String])
