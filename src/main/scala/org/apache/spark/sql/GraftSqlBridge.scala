package org.apache.spark.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.json.{CreateJacksonParser, JacksonParser, JSONOptions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/**
 * The one-file bridge into `private[sql]` plan constructors — the standard
 * move for Spark extension libraries that add whole operators (a custom
 * `LogicalPlan` cannot become a `DataFrame` through any public API).
 * Everything else in graft lives outside the Spark namespace; only the
 * three capabilities below are bridged, all read-only with respect to
 * Spark internals.
 */
object GraftSqlBridge {

  /** Build a DataFrame over a (resolved) custom logical plan. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (attribute-stable). */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** A JSON-object-per-line parser onto `schema` (Spark's own Jackson
    * parsing path, the same machinery the json file source uses). Returns
    * null for a corrupt line — the caller decides routing. Construct on the
    * EXECUTOR (the parser is not serializable). */
  def jsonLineParser(schema: StructType): String => InternalRow = {
    val parser = new JacksonParser(schema,
      new JSONOptions(Map.empty[String, String], "UTC"), false, Nil)
    val create = CreateJacksonParser.string _
    (line: String) =>
      try parser.parse(line, create, UTF8String.fromString)
        .headOption.map(_.copy()).orNull
      catch { case scala.util.control.NonFatal(_) => null }
  }

  /** [[jsonLineParser]] over raw UTF-8 bytes (r17): a reader that already
    * holds the line as bytes must not decode to java.lang.String just for
    * Jackson to re-read it — `CreateJacksonParser.utf8String` parses the
    * bytes directly (the from_json code path). Same corrupt-line contract. */
  def jsonLineParserUtf8(schema: StructType): UTF8String => InternalRow = {
    val parser = new JacksonParser(schema,
      new JSONOptions(Map.empty[String, String], "UTC"), false, Nil)
    val create = CreateJacksonParser.utf8String _
    (line: UTF8String) =>
      try parser.parse(line, create, (u: UTF8String) => u)
        .headOption.map(_.copy()).orNull
      catch { case scala.util.control.NonFatal(_) => null }
  }
}
