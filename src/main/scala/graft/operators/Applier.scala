package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.codec.Codecs._
import graft.model._
import graft.sources.CatalogSnapshot

/**
 * Apply plane: folds action datasets into the target catalog snapshot.
 *
 * In the reference, "apply" is a sequence of Glue API calls (CreateDatabase,
 * Create/UpdateTable, BatchCreate/DeletePartition) made one entity at a time
 * from inside Lambdas, with API-limit chunking (100-partition create batches,
 * 25-partition delete batches — GlueUtil.java:414-420,510-512). In fixture
 * mode the target catalog IS a snapshot, so apply is pure set algebra; a live
 * connector performs the same fold via foreachPartition + grouped(n) at the
 * sink (see ChunkedSink), keeping chunking a sink concern, not a logical
 * operator (SURVEY §2.4 A3).
 *
 * Idempotency: every apply is an upsert/replace keyed on entity identity, so
 * at-least-once redelivery (reference rethrow-for-redelivery,
 * ImportLargeTable.java:78-81) converges to the same state.
 */
object Applier {

  /** J1 apply: union created databases into the target plane. Creates pass
    * through the DatabaseInput projection first (createTime is catalog-
    * managed, never replicated — GlueUtil.java:146-152), keeping this fold
    * field-for-field equal to what a live CreateDatabase call lands. */
  def applyDatabases(tgt: Dataset[GDatabase], actions: DataFrame): Dataset[GDatabase] = {
    val creates = Projection.toDatabaseInput(
      actions.where(col("action") === Action.Create).drop("action"))
    tgt.unionByName(creates.as[GDatabase]).dropDuplicates("name").as[GDatabase]
  }

  /** J2 apply: replace-or-insert every created/updated table. Duplicate
    * messages for the same (databaseName, name) — the at-least-once
    * redelivery case — collapse to one row, keeping the upsert idempotent
    * like applyDatabases/applyPartitions. Rows pass through the P3
    * writable-subset projection first, exactly where the reference builds
    * its TableInput (GlueUtil.java:264-350 → createTableInput). */
  def applyTables(tgt: Dataset[GTable], actions: DataFrame): Dataset[GTable] = {
    val upserts = Projection.toTableInput(actions
      .where(col("action").isin(Action.Create, Action.Update))
      .drop("action"))
      .dropDuplicates("databaseName", "name")
    val untouched = tgt.join(
      upserts.select(col("databaseName"), col("name")), Seq("databaseName", "name"), "left_anti")
    untouched.unionByName(upserts).as[GTable]
  }

  /** J3 apply: drop deleted partitions (keyed on databaseName, tableName,
    * values — GlueUtil.java:504-508), then add creates. Wholesale semantics
    * compose correctly because deletes are applied before creates. */
  def applyPartitions(tgt: Dataset[GPartition], actions: DataFrame): Dataset[GPartition] = {
    val key = Seq("databaseName", "tableName", "values")
    val deletes = actions.where(col("action") === Action.Delete).select(key.map(col): _*)
    // P4: creates carry only identity + storageDescriptor (PartitionInput).
    val creates = Projection.toPartitionInput(
      actions.where(col("action") === Action.Create).drop("action"))
      .select(tgt.columns.map(col).toSeq: _*)
    val kept = tgt.join(deletes, key, "left_anti")
    kept.unionByName(creates).dropDuplicates(key).as[GPartition]
  }
}

/**
 * Chunked sink — the reference's API-limit batching as a reusable sink helper:
 * BatchCreatePartition 100/call, BatchDeletePartition 25/call, DynamoDB
 * BatchWriteItem 25/call with unprocessed-item retry (GlueUtil.java:414-420,
 * 510-512; DDBUtil.java:229-243). Executor-side, no driver collect: each task
 * walks its partition iterator in `chunkSize` groups.
 */
object ChunkedSink {
  val CreatePartitionChunk = 100
  val DeletePartitionChunk = 25
  val AuditBatchChunk = 25

  /** Invoke `call` once per chunk of `chunkSize` rows, per task. `call` is the
    * external-API boundary (Glue/DDB in live mode; test probes in specs). */
  def foreachChunk[T](ds: Dataset[T], chunkSize: Int)(call: Seq[T] => Unit): Unit =
    ds.foreachPartition { (it: Iterator[T]) =>
      it.grouped(chunkSize).foreach(g => call(g.toSeq))
    }
}
