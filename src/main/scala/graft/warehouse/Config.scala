package graft.warehouse

/** Engine configuration constants — the reference's config surface
  * (`src/load_datawarehouse/config.py:7-8`,
  * `src/load_datawarehouse/bigquery/config.py:2-3`,
  * locations enum `src/load_datawarehouse/bigquery/__init__.py:33-63`).
  */
object Config {

  /** BIGQUERY_JSON_BYTES_LIMIT — hard cap per chunk / API call. */
  val JsonBytesLimit: Long = 20L * (1L << 20)

  /** Default region (BIGQUERY_DEFAULT_LOCATION). Unused in the compute
    * path; kept for API parity.
    */
  val DefaultLocation: String = "europe-west2"

  /** Schema-evolution thresholds — declared in the reference but marked
    * unimplemented (config.py:1-6); surfaced here next to
    * `Deconstructed.factorOfRecordsAddingFields`, which measures the
    * quantity they would gate on.
    */
  val MinRecordsToTriggerDiffCheck: Int = 50
  val MaxFactorOfRecordsWhichAddsFields: Double = 0.25

  /** Warehouse regions (the reference's `locations` enum — 29 regions +
    * DEFAULT). Config vocabulary only; no compute depends on it.
    */
  val Locations: Seq[String] = Seq("DEFAULT",
    "us-east1", "us-east4", "us-west1", "us-west2", "us-west3", "us-west4",
    "us-central1", "northamerica-northeast1", "southamerica-east1",
    "europe-west1", "europe-west2", "europe-west3", "europe-west4",
    "europe-west6", "europe-north1", "europe-central2",
    "asia-east1", "asia-east2", "asia-northeast1", "asia-northeast2",
    "asia-northeast3", "asia-south1", "asia-south2", "asia-southeast1",
    "asia-southeast2", "australia-southeast1", "australia-southeast2",
    "me-west1", "africa-south1")
}
