package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * P3/P4 — writable-subset projections: the shapes the reference builds just
 * before writing into the target catalog, with the catalog-managed fields
 * removed.
 *
 * P3 Table → TableInput (GlueUtil.createTableInput, GlueUtil.java:175-192):
 * copied = description (java:177), lastAccessTime, owner, name,
 * storageDescriptor, partitionKeys, tableType, viewExpandedText,
 * viewOriginalText, parameters; dropped = createTime, updateTime, createdBy,
 * retention (the target catalog stamps its own).
 *
 * The parameters-overwrite quirk, preserved exactly: the reference first
 * copies StorageDescriptor.parameters into TableInput.parameters
 * (java:181-182) and then UNCONDITIONALLY overwrites them with the
 * table-level parameters (java:186). Last setter wins, so the SD copy is
 * observably dead and the table-level map is final even when null — a
 * replicated table never inherits its SD's parameters at table level.
 *
 * P4 Partition → PartitionInput (GlueUtil.addPartitions, java:406-413):
 * copied = values, storageDescriptor ONLY; databaseName/tableName ride the
 * batch request (here: kept as join keys); creationTime, lastAccessTime and
 * partition parameters are dropped.
 */
object Projection {

  /** Database → DatabaseInput (GlueUtil.createGlueDatabase, java:146-152):
    * copied = name, description, locationUri, parameters; createTime is NOT
    * copied — the target catalog stamps its own. Input/output: GDatabase-
    * shaped frame. */
  def toDatabaseInput(dbs: DataFrame): DataFrame =
    dbs.withColumn("createTimeMs", lit(null).cast("bigint"))

  /** P3: null the non-writable table fields, keep identity + writable set.
    * Input/output: GTable-shaped DataFrame (same schema — composes with
    * Applier and the message plane). */
  def toTableInput(tables: DataFrame): DataFrame =
    tables
      .withColumn("createTimeMs", lit(null).cast("bigint"))
      .withColumn("updateTimeMs", lit(null).cast("bigint"))
      .withColumn("createdBy", lit(null).cast("string"))
      .withColumn("retention", lit(0))
      // parameters: table-level wins unconditionally (the java:186 overwrite)
      // — already the column's value; nothing to merge from the SD.

  /** P4: keep partition identity + storageDescriptor, drop the rest. */
  def toPartitionInput(parts: DataFrame): DataFrame =
    parts
      .withColumn("creationTimeMs", lit(null).cast("bigint"))
      .withColumn("lastAccessTimeMs", lit(null).cast("bigint"))
      .withColumn("parameters", lit(null).cast("map<string,string>"))
}
