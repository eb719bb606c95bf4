package graft

import org.apache.spark.sql.SparkSession

/** Session tuning shared by every engine entry point (Bench, Verify,
  * PlanDump, JobProfile). One place so the bench, the oracle dump and
  * the plan audits all run the configuration the engine is designed
  * for.
  *
  * Every setting here is scale-adaptive (sized by bytes/cardinality at
  * runtime), not a local[32] constant — the r20 optimization-round
  * rule. Scale-DEPENDENT knobs stay env-parameterised with defaults
  * that keep the driver's bench methodology unchanged.
  */
object GraftSession {

  /** Apply engine-wide tuning to a session builder.
    *
    * Deliberately EMPTY of the cached-plan AQE flag: a session-wide
    * `canChangeCachedPlanOutputPartitioning=true` was A/B-measured in
    * r20 (30-query tail subset, 3 warm passes) at ×1.01 NET — the
    * census-family queries won ×0.52–0.78 (their cached censuses are
    * byte-light, and byte-based coalescing removes ~30 near-empty
    * tasks per downstream job) but the dedup/LSH family REGRESSED up
    * to ×2.07 (q129): shingle/MinHash caches are byte-LIGHT but
    * CPU-DENSE, and coalescing them to one partition serialized the
    * hot stages (JobProfile: 33-task 0.1 s stages became 1-task
    * 0.2–0.4 s stages). AQE sizes by bytes and cannot see CPU density,
    * so the flag is applied PER CACHE by the operators that know their
    * cached frame is a post-aggregate census —
    * [[AdaptiveCache.persistByteAdaptive]] — not session-wide.
    */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b
}
