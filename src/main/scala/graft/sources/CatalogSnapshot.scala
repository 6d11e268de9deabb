package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.codec.Codecs._
import graft.model._

/**
 * A point-in-time view of one catalog: the three entity planes as Datasets.
 *
 * Replaces the reference's paginated point-scan API surface
 * (GlueUtil.getDatabases:84-105, getTables:202-228, getPartitions:361-386):
 * pagination loops become source partition planning, and per-db / per-table
 * fetches become pushed-down predicates (`.where`) on the snapshot — Catalyst
 * prunes at the parquet/json scan, so a 1000-executor run reads only the
 * row groups its filters touch.
 *
 * Snapshot isolation comes free: one run reads one snapshot, which also
 * subsumes the reference's defensive re-fetch in ExportLargeTable.java:161-177.
 */
final case class CatalogSnapshot(
    catalogId: String,
    databases: Dataset[GDatabase],
    tables: Dataset[GTable],
    partitions: Dataset[GPartition]) {

  /** S2: tables of one database — predicate pushed to the source scan. */
  def tablesOf(db: String): Dataset[GTable] =
    tables.where(tables("databaseName") === db)

  /** S3: partitions of one table — predicate pushed to the source scan. */
  def partitionsOf(db: String, table: String): Dataset[GPartition] =
    partitions.where(partitions("databaseName") === db && partitions("tableName") === table)
}

object CatalogSnapshot {

  /** Fixture catalog: parquet dirs `databases/ tables/ partitions/` under `dir`.
    * Used by tests and local runs; a live catalog-API connector would slot in
    * behind the same three Datasets. */
  def fromParquet(spark: SparkSession, catalogId: String, dir: String): CatalogSnapshot =
    CatalogSnapshot(
      catalogId,
      spark.read.schema(databaseSchema).parquet(s"$dir/databases").as[GDatabase],
      spark.read.schema(tableSchema).parquet(s"$dir/tables").as[GTable],
      spark.read.schema(partitionSchema).parquet(s"$dir/partitions").as[GPartition])

  /** Fixture catalog from JSON-lines files (golden-fixture tests). */
  def fromJson(spark: SparkSession, catalogId: String, dir: String): CatalogSnapshot =
    CatalogSnapshot(
      catalogId,
      spark.read.schema(databaseSchema).json(s"$dir/databases.jsonl").as[GDatabase],
      spark.read.schema(tableSchema).json(s"$dir/tables.jsonl").as[GTable],
      spark.read.schema(partitionSchema).json(s"$dir/partitions.jsonl").as[GPartition])

  /** In-memory snapshot for tests and decision-table specs. */
  def inMemory(
      spark: SparkSession,
      catalogId: String,
      dbs: Seq[GDatabase],
      tables: Seq[GTable],
      parts: Seq[GPartition]): CatalogSnapshot = {
    CatalogSnapshot(
      catalogId,
      spark.createDataset(dbs),
      spark.createDataset(tables),
      spark.createDataset(parts))
  }

  /** An empty target catalog. */
  def empty(spark: SparkSession, catalogId: String): CatalogSnapshot =
    inMemory(spark, catalogId, Seq.empty, Seq.empty, Seq.empty)

  def writeParquet(snap: CatalogSnapshot, dir: String): Unit = {
    snap.databases.write.mode("overwrite").parquet(s"$dir/databases")
    snap.tables.write.mode("overwrite").parquet(s"$dir/tables")
    // Partition plane is the big one at scale: lay it out by databaseName so
    // per-db/table reconciliation prunes files instead of scanning 1M rows.
    // Cluster rows by databaseName before the partitioned write — without it
    // every task writes a sliver into every db dir (tasks × dbs small files,
    // the classic metadata-killer at 1000 executors); with it each dir gets
    // its task's consolidated files.
    snap.partitions
      .repartition(org.apache.spark.sql.functions.col("databaseName"))
      .write.mode("overwrite").partitionBy("databaseName").parquet(s"$dir/partitions")
  }

  /** Bucketed partition-plane layout: when source and target planes are both
    * bucketed on the table key with the same bucket count, the J3 reconcile
    * join is co-partitioned at read time — NO shuffle of either 1M-partition
    * plane (HashPartitioning(databaseName, tableName) satisfies the join's
    * clustering on (databaseName, tableName, values)). This is the standing
    * layout for an incremental/ongoing-mode deployment where reconcile runs
    * daily against the same planes; asserted by PlanAuditSpec. */
  def writeBucketedPartitions(
      parts: Dataset[GPartition], tableName: String, buckets: Int = 32): Unit =
    parts.write.mode("overwrite")
      .bucketBy(buckets, "databaseName", "tableName")
      .sortBy("databaseName", "tableName")
      .format("parquet")
      .saveAsTable(tableName)
}
