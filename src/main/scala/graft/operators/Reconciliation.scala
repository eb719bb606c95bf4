package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The PPE pre/post-ETL row-count reconciliation pipeline
  * (SURVEY.md §2/§3, reference: pre_and_post_etl_checks.py).
  *
  * Source-side census: per-site, per-table live-row counts (soft-
  * delete filtered, PPE:45-110). Destination-side census: the same
  * tables grouped by site_id in the warehouse (PPE:159-222). The two
  * are reconciled with a full outer equi-join on the composite key
  * (site_id, table_name) (PPE:229-237) and a null-propagating
  * variance = source − destination (PPE:239).
  *
  * Scale notes: each census branch partial-aggregates at the scan
  * (one row per site per table crosses the shuffle); both join sides
  * are ≤ sites × tables rows, so the reconciliation join is always
  * broadcastable no matter how large the underlying fact data is.
  */
object Reconciliation {

  /** One table's census: branch label, frame, site key, and the
    * optional live-row predicate (`voided = 0` analog; `None`
    * reproduces the patient_state no-voided-column quirk, PPE:106).
    */
  final case class CensusSpec(
      tableName: String,
      df: DataFrame,
      siteId: Column,
      liveRow: Option[Column])

  /** Per-site grouped count for one table (A2/A3 + P3): zero rows for
    * an empty/fully-filtered table — empty groups don't exist; the
    * outer join downstream is what surfaces the gap (SURVEY.md §2.8.1).
    */
  def census(spec: CensusSpec): DataFrame = {
    val filtered = spec.liveRow.fold(spec.df)(spec.df.filter)
    filtered
      .groupBy(spec.siteId.cast("int").as("site_id"))
      .agg(count(lit(1)).as("record_count"))
      .select(
        col("site_id"),
        lit(spec.tableName).as("table_name"),   // P5 branch tag
        col("record_count"))
  }

  /** Multi-table census: union of per-table branches (U2/U3). The
    * reference hand-split its destination union "to optimize"
    * (PPE:158); under Spark the branches are independent parallel
    * stages, so a single unioned plan is already optimal.
    */
  def censusUnion(specs: Seq[CensusSpec]): DataFrame =
    specs.map(census).reduce(_ unionByName _)

  /** Full outer reconciliation (J1): USING-join on the composite key
    * coalesces key columns (pandas `on=` semantics); the overlapping
    * `record_count` measure is pre-renamed with the `_source` /
    * `_ohdl` suffixes (PPE:231-237). Both sides are tiny aggregates;
    * no explicit broadcast hint — this Spark build rejects build-side
    * broadcast for full-outer joins (the hint only logged warnings
    * and fell back), and AQE already picks the cheapest legal
    * strategy for sub-threshold sides.
    */
  def reconcile(
      source: DataFrame,
      destination: DataFrame,
      dateCreated: Column): DataFrame = {
    val src = source.withColumnRenamed("record_count", "record_count_source")
    val dst = destination.withColumnRenamed("record_count", "record_count_ohdl")
    // extra descriptive columns on the source side (e.g. site_name,
    // PPE:48) ride along; null on destination-only rows, like pandas.
    val extras = src.columns.toSeq
      .filterNot(Seq("site_id", "table_name", "record_count_source").contains)
    src
      .join(dst, Seq("site_id", "table_name"), "full_outer")
      .withColumn("variance",
        col("record_count_source") - col("record_count_ohdl")) // E9 null-propagating
      .withColumn("date_created", dateCreated)                 // E10 audit column
      .select((Seq("site_id", "table_name") ++ extras ++
        Seq("record_count_source", "record_count_ohdl", "variance",
          "date_created")).map(col): _*)
  }
}
