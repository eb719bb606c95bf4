package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser extension that makes the check registry reachable from PURE
  * SQL text — `spark.sql("CALL graft.<check>(name => 'value', ...)")`
  * — the reference's native idiom (its whole user surface is SQL
  * strings). Injected by [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`); every other
  * statement passes through to the delegate parser untouched.
  *
  * Grammar (deliberately tiny): `CALL graft.<identifier>(` then
  * comma-separated `key => 'value'` pairs with standard SQL `''`
  * escaping, then `)`. Values are opaque strings handed to
  * [[GraftChecks.run]] — expression-valued arguments are compiled by
  * the check itself against its named table, so the full SQL
  * expression language is available inside them. `CALL graft.help()`
  * lists the registry.
  *
  * The returned plan is the check's analyzed logical plan; checks
  * that run eager cardinality probes do that work at parse time —
  * the same moment the reference's client ran its SQL.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val CallPattern =
    """(?is)\s*CALL\s+graft\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)\s*\((.*)\)\s*;?\s*""".r

  // one `key => 'value'` pair; '' is the escaped quote
  private val ArgPattern =
    """(?s)\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s*=>\s*'((?:[^']|'')*)'\s*""".r

  private def parseArgs(raw: String, check: String): Map[String, String] = {
    val trimmed = raw.trim
    if (trimmed.isEmpty) Map.empty
    else {
      // split on commas OUTSIDE single-quoted strings
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inQuote = false
      trimmed.foreach {
        case '\'' => inQuote = !inQuote; sb += '\''
        case ',' if !inQuote => parts += sb.toString(); sb.clear()
        case c => sb += c
      }
      parts += sb.toString()
      parts.map {
        case ArgPattern(k, v) => k -> v.replace("''", "'")
        case other => throw new IllegalArgumentException(
          s"graft.$check: cannot parse argument `${other.trim}` — " +
            "expected key => 'value' (escape quotes as '')")
      }.toMap
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case CallPattern(check, rawArgs) =>
      GraftChecks.run(session, check, parseArgs(rawArgs, check))
        .queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
