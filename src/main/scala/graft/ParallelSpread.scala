package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, SubqueryAlias}

/** Spread an UNSPLITTABLE input across the session's cores before
  * CPU-dense per-row work — guide §2.5's input-skew remedy
  * ("one huge unsplittable file … repartition immediately after the
  * read").
  *
  * The bench corpus ships one parquet ROW GROUP per table, and a row
  * group is Spark's minimum split: every scan runs as ONE effective
  * task no matter how many splits the scheduler makes. That is free
  * for scan-bound aggregates, but the document/embedding pipelines do
  * heavy per-row CPU (shingling, 64-way minhash, cosine scoring,
  * md5 resampling) directly on the scan output — JobProfile (r20)
  * measured their hot stages as single-task 0.5–1.6 s while 31 cores
  * idle.
  *
  * Scale-adaptivity, in order:
  *  - the repartition fires only when the input's partition count is
  *    BELOW the session default parallelism — a real cluster scan of
  *    a real table carries many tasks, making this a structural no-op
  *    there (no exchange is added to the plan at all);
  *  - the partition probe (`df.rdd.getNumPartitions`) is only taken
  *    when the analyzed plan is a bare scan/filter/project chain —
  *    on such plans the probe is pure metadata. Anything with a
  *    join/aggregate/exchange underneath is returned UNCHANGED, both
  *    because probing it under AQE could eagerly run stages and
  *    because post-shuffle frames already carry
  *    `spark.sql.shuffle.partitions` partitions.
  *
  * Row-level semantics are untouched: the operators this feeds are
  * per-row projections and order-independent aggregations (the
  * engine-exact discipline), and the repartition is HASH on a key
  * column — deterministic, no round-robin sort.
  */
object ParallelSpread {

  /** True only for a bare scan/filter/project chain whose leaves are
    * FILE scans: the one-row-group input skew this spread was measured
    * on lives behind a file scan, while an in-memory/LocalRelation
    * frame (unit tests, small fixtures) gains nothing from a hash
    * exchange and should pass through untouched (r21, ADVICE item).
    */
  private def scanChainOnly(df: DataFrame): Boolean = {
    var fileLeaf = false
    val chainOk = df.queryExecution.analyzed.collect { case p => p }.forall {
      case _: Project | _: Filter | _: SubqueryAlias => true
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        fileLeaf = true; true
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        fileLeaf = true; true
      case _ => false
    }
    chainOk && fileLeaf
  }

  def forCpu(df: DataFrame, key: Column): DataFrame = {
    if (!scanChainOnly(df)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
