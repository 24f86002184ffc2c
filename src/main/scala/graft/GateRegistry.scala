package graft

/** The ONE registry of streamed gates (r14 ADVICE: the predicate was
  * the substring `contains("_stream")` replicated in three consumers —
  * BenchBudget.profileChanged, PlanLintSpec's exclusion, and
  * tools/freeze_anchors.py — so any future BATCH gate whose name
  * happened to contain `_stream` would silently inherit the weaker
  * shuffle-only profile signature and skip the CartesianProduct lint).
  *
  * Consumers key on THIS set:
  *  - [[BenchBudget.profileChanged]] — streamed gates' job/stage counts
  *    are not load-invariant (no-data micro-batch scheduling), so their
  *    profile signature is shuffle bytes only;
  *  - PlanLintSpec — invoking a streamed gate RUNS its bounded
  *    streaming job and would lint the pinned LocalRelation result
  *    (vacuous), so they are excluded there;
  *  - tools/freeze_anchors.py — via the committed mirror
  *    `docs/STREAMED_GATES.json` (python cannot read this object).
  *
  * GateRegistrySpec keeps all three in sync: every member must be a
  * live SparkEntry.queries key (a rename breaks loudly), every queries
  * key containing "_stream" must be registered (a new streamed gate
  * following the naming convention cannot be forgotten), and the JSON
  * mirror must equal this set byte-for-byte.
  */
object GateRegistry {

  /** Gates whose timed run is a Structured Streaming replay. */
  val streamed: Set[String] = Set(
    "dedup_ingest_stream",
    "dedup_ingest_stream_wb",
    "events_attribution_outer_stream",
    "events_attribution_stream",
    "events_dedup_stream",
    "events_enrich_stream",
    "events_funnel_stream",
    "events_hourly_upsert_stream",
    "events_retention_stream",
    "events_session_window_stream",
    "events_sessionize_stream",
    "events_sliding_stream",
    "knn_serve_stream",
    "knn_serve_stream_batched",
    "knn_serve_stream_batched_ivf",
    "knn_serve_stream_batched_mp",
    "knn_serve_stream_ivf",
    "knn_serve_stream_rule")
}
