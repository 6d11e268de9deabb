package graft.operators

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.functions._

import graft.model.GDatabase

/**
 * Replication planner — selects which databases a run replicates.
 *
 * Reference: GDCReplicationPlanner.getRequiredDatabases
 * (lambda/GDCReplicationPlanner.java:124-137, branch at 70-81): keep databases
 * whose lowercased name starts with any configured prefix; an empty prefix
 * list keeps everything. Prefix string is tokenized on a configurable
 * separator, default "|" (java:109-116).
 *
 * Spark-first: the predicate is a single Catalyst expression, so it pushes
 * down into the database-plane scan (P1 in SURVEY §2.2) — at scale the source
 * reads only matching row groups instead of filtering post-hoc.
 */
object Planner {

  val DefaultSeparator = "|"

  /** P2: split the configured prefix string into prefixes; empty/blank input →
    * empty list (= replicate everything). Driver-side by design — config
    * parsing, not data flow. */
  def tokenizePrefixes(prefixString: String, separator: String = DefaultSeparator): Seq[String] =
    Option(prefixString).map(_.trim).filter(_.nonEmpty) match {
      case None => Seq.empty
      case Some(s) => s.split(java.util.regex.Pattern.quote(separator)).map(_.trim).filter(_.nonEmpty).toSeq
    }

  /** P1 predicate: lowercased `name` starts with the RAW configured prefix —
    * exactly the reference's `name.toLowerCase().startsWith(dbPrefix)` at
    * java:129. A prefix containing uppercase therefore never matches, same as
    * the reference (the prefix is deliberately NOT lowercased here). */
  def prefixPredicate(nameCol: Column, prefixes: Seq[String]): Column =
    prefixes
      .map(p => lower(nameCol).startsWith(p))
      .reduceOption(_ || _)
      .getOrElse(lit(true))

  /** Select the databases this run exports. */
  def selectDatabases(dbs: Dataset[GDatabase], prefixes: Seq[String]): Dataset[GDatabase] =
    if (prefixes.isEmpty) dbs
    else dbs.where(prefixPredicate(dbs("name"), prefixes))
}
