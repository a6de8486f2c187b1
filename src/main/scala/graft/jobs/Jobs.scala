package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Job layer — SURVEY.md §2.1 S8 + §3: the reference's three entry
  * points (`JOB` env selects `upload_advisors`, `upload_recent_refresh`,
  * `upload_snapshot`; jonesy.py:13-16, jonesy/jobs.py:28-65), each a
  * named pipeline of (query → sink) pairs over the shared catalog.
  *
  * Unknown job → message and no-op, not an exception
  * (reference: jonesy/jobs.py:64-65 semantics preserved).
  */
object Jobs {

  /** Which catalog queries each job extracts. Mirrors §3: advisors =
    * the advisor projections + greatest-per-group relationship extract;
    * recent refresh = the watermark/CDC incrementals; snapshot = the
    * full-extract set driven by current-term resolution. */
  val pipelines: Map[String, Seq[String]] = Map(
    "upload_advisors" -> Seq(
      "ref_advisor_notes", "ref_latest_order_per_customer"),
    "upload_recent_refresh" -> Seq(
      "ev_watermark", "ev_cdc_filter", "ref_conditional_join"),
    "upload_snapshot" -> Seq(
      "ref_current_terms", "ref_basic_attributes", "ref_term_courses",
      "ref_full_names", "ref_meeting_days"))

  /** Run one job: every query in its pipeline is written gzip-CSV to
    * each target under the md5-dated daily key. Returns
    * (query, target, ok) rows; empty for an unknown job. */
  def run(job: String, spark: SparkSession, sfDir: String,
          targets: Seq[String], isoDate: String)
      : Seq[(String, String, Boolean)] =
    pipelines.get(job) match {
      case None =>
        System.err.println(
          s"[jobs] unknown job '$job' — known: ${pipelines.keys.mkString(", ")}")
        Seq.empty
      case Some(queryNames) =>
        for {
          name <- queryNames
          df = SparkEntry.queries(name)(spark, sfDir)
          (target, ok) <- Sinks.fanOut(df, targets,
            Sinks.dailyKey(isoDate, name))
        } yield (name, target, ok)
    }
}
