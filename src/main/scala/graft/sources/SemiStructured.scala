package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semi-structured (JSON-lines) ingestion with schema-on-error
  * quarantine — the file-level analogue of the reference's dynamic
  * schema-on-error handling (SURVEY §1.3: a source that fails its
  * schema contract is recorded and skipped, never fatal): malformed
  * lines land in a quarantine column with their raw text preserved,
  * well-formed lines parse against the declared schema, and one read
  * produces both.
  */
object SemiStructured {

  val CorruptCol = "_corrupt_record"

  /** Read JSON-lines under `dir` against an EXPLICIT schema in
    * PERMISSIVE mode. A malformed line yields a row with every data
    * column null and the raw line in [[CorruptCol]]; a well-formed
    * line with a missing field yields null for that field only.
    *
    * The explicit schema is non-negotiable at scale: inference is a
    * full extra pass over the input before the real read starts, and
    * a 100 TB ingest cannot afford to discover its schema from the
    * data it is about to read.
    */
  def readJsonlQuarantine(
      spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not declare $CorruptCol — it is added by the reader")
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType, nullable = true)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(dir)
  }

  /** Split an ingested frame into (good rows without the quarantine
    * column, quarantined rows with all columns). The quarantined
    * side deliberately keeps the data columns alongside the raw
    * line: Spark disallows queries whose only referenced column from
    * a raw JSON scan is the corrupt-record column, and the nulls are
    * part of the quarantine record anyway.
    */
  def quarantineSplit(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col(CorruptCol).isNull).drop(CorruptCol),
      df.filter(col(CorruptCol).isNotNull))
}
