package graft.catalog

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.model._

/** One recorded API call: operation name + batch size (1 for point calls).
  * The contract specs assert chunking/pagination/retry behavior from this
  * log instead of trusting the sink's own claims. */
final case class GlueCallRecord(op: String, batchSize: Int)

/**
 * A faithful in-memory Glue Data Catalog: the service side of
 * [[GlueCatalogClient]], with the behaviors the reference depends on made
 * observable —
 *
 *  - token pagination with a configurable page size (the reference's
 *    nextToken do/while loops, GlueUtil.java:91-103, must iterate);
 *  - entity semantics: AlreadyExists / EntityNotFound on the same operations
 *    the real service raises them (create into existing, update/create into
 *    missing parents);
 *  - UpdateTable archiving: `skipArchive = false` snapshots the previous
 *    version (GlueUtil.java:292-294's write-amplification control) — the
 *    archive count is how specs verify the flag actually passed through;
 *  - batch-size validation: BatchCreatePartition rejects >100 rows,
 *    BatchDeletePartition >25 (service-side InvalidInput), so an unchunked
 *    sink FAILS tests instead of silently working;
 *  - per-partition errors inside batches (duplicate create → AlreadyExists
 *    entry, missing delete key → not-found entry), never a thrown batch error;
 *  - fault injection: `throttleNext(op, n)` makes the next n calls of `op`
 *    throw [[GlueThrottlingException]] — the retry policy's test surface.
 *
 * Thread-safe (synchronized state): local-mode executors hit one instance
 * concurrently. Instances live in a JVM-wide registry keyed by catalog id so
 * serialized task closures reach the same instance via
 * [[InMemoryClientFactory]] — the in-memory stand-in for "every executor's
 * SDK client talks to the same service".
 */
final class InMemoryGlueCatalog(val catalogId: String, pageSize: Int = 100)
    extends GlueCatalogClient {

  private val dbs = mutable.LinkedHashMap.empty[String, GDatabase]
  private val tables = mutable.LinkedHashMap.empty[(String, String), GTable]
  private val parts = mutable.LinkedHashMap.empty[(String, String, Seq[String]), GPartition]
  private val archived = mutable.ArrayBuffer.empty[GTable]

  private val callLog = new ConcurrentLinkedQueue[GlueCallRecord]()
  private val throttles = new ConcurrentHashMap[String, AtomicInteger]()

  // ------------------------------------------------------------ observation

  def calls: Seq[GlueCallRecord] = callLog.asScala.toSeq
  def callCount(op: String): Int = calls.count(_.op == op)
  def archivedVersions: Seq[GTable] = synchronized(archived.toSeq)
  def clearCallLog(): Unit = callLog.clear()

  /** Make the next `n` calls of `op` fail with a retryable throttling fault. */
  def throttleNext(op: String, n: Int): Unit =
    throttles.computeIfAbsent(op, _ => new AtomicInteger(0)).set(n)

  private def record(op: String, batchSize: Int = 1): Unit = {
    callLog.add(GlueCallRecord(op, batchSize))
    val remaining = throttles.get(op)
    if (remaining != null && remaining.getAndUpdate(v => math.max(v - 1, 0)) > 0)
      throw new GlueThrottlingException(s"injected throttle on $op")
  }

  // ------------------------------------------------------------- pagination

  /** Tokens are plain offsets — adequate for a test double; the real service's
    * tokens are opaque, which the client contract already respects. */
  private def page[T](all: Seq[T], nextToken: Option[String]): GluePage[T] = {
    val from = nextToken.map(_.toInt).getOrElse(0)
    val items = all.slice(from, from + pageSize)
    val next = if (from + pageSize < all.size) Some((from + pageSize).toString) else None
    GluePage(items, next)
  }

  // ------------------------------------------------------------------ reads

  def getDatabases(nextToken: Option[String]): GluePage[GDatabase] = synchronized {
    record("GetDatabases"); page(dbs.values.toSeq, nextToken)
  }

  /** The real GetTables throws EntityNotFoundException for an absent database
    * (it does NOT return an empty page) — faithful here so source-side
    * handling is exercised by tests, not just documented. */
  def getTables(databaseName: String, nextToken: Option[String]): GluePage[GTable] = synchronized {
    record("GetTables")
    if (!dbs.contains(databaseName))
      throw new GlueEntityNotFoundException(s"database $databaseName not found")
    page(tables.values.filter(_.databaseName == databaseName).toSeq, nextToken)
  }

  /** Segments slice on a stable hash of the partition values (the service
    * hashes internally too — any disjoint+complete slicing satisfies the
    * contract the source relies on). */
  def getPartitions(databaseName: String, tableName: String, nextToken: Option[String],
      segment: Option[GlueSegment] = None): GluePage[GPartition] =
    synchronized {
      record("GetPartitions")
      // Real-service fidelity: GetPartitions on an absent table throws
      // EntityNotFoundException — the case a pruned per-micro-batch fetch hits
      // for every table its messages are about to CREATE on the target.
      if (!tables.contains((databaseName, tableName)))
        throw new GlueEntityNotFoundException(s"table $databaseName.$tableName not found")
      val all = parts.values.filter(p => p.databaseName == databaseName && p.tableName == tableName).toSeq
      val sliced = segment match {
        case None => all
        case Some(GlueSegment(n, total)) =>
          all.filter(p => math.floorMod(p.values.hashCode, total) == n)
      }
      page(sliced, nextToken)
    }

  def getDatabase(name: String): Option[GDatabase] = synchronized {
    record("GetDatabase"); dbs.get(name)
  }

  def getTable(databaseName: String, name: String): Option[GTable] = synchronized {
    record("GetTable"); tables.get((databaseName, name))
  }

  // ----------------------------------------------------------------- writes

  /** DatabaseInput semantics: the catalog-managed createTime is stamped by the
    * service; here it stays None so runs are deterministic. */
  def createDatabase(db: GDatabase): Unit = synchronized {
    record("CreateDatabase")
    if (dbs.contains(db.name))
      throw new GlueAlreadyExistsException(s"database ${db.name} already exists")
    dbs(db.name) = db.copy(createTimeMs = None)
  }

  def createTable(table: GTable): Unit = synchronized {
    record("CreateTable")
    if (!dbs.contains(table.databaseName))
      throw new GlueEntityNotFoundException(s"database ${table.databaseName} not found")
    val key = (table.databaseName, table.name)
    if (tables.contains(key))
      throw new GlueAlreadyExistsException(s"table ${table.databaseName}.${table.name} already exists")
    tables(key) = table
  }

  def updateTable(table: GTable, skipArchive: Boolean): Unit = synchronized {
    record("UpdateTable")
    val key = (table.databaseName, table.name)
    val prev = tables.getOrElse(key,
      throw new GlueEntityNotFoundException(s"table ${table.databaseName}.${table.name} not found"))
    if (!skipArchive) archived += prev
    tables(key) = table
  }

  def batchCreatePartitions(
      databaseName: String, tableName: String, newParts: Seq[GPartition]): Seq[GluePartitionError] = synchronized {
    record("BatchCreatePartition", newParts.size)
    if (newParts.size > GlueLimits.BatchCreatePartitions)
      throw new IllegalArgumentException(
        s"BatchCreatePartition accepts at most ${GlueLimits.BatchCreatePartitions} partitions, got ${newParts.size}")
    if (!tables.contains((databaseName, tableName)))
      throw new GlueEntityNotFoundException(s"table $databaseName.$tableName not found")
    newParts.flatMap { p =>
      val key = (databaseName, tableName, p.values)
      if (parts.contains(key))
        Some(GluePartitionError(p.values, "AlreadyExistsException", "partition exists"))
      else {
        parts(key) = p.copy(databaseName = databaseName, tableName = tableName)
        None
      }
    }
  }

  def batchDeletePartitions(
      databaseName: String, tableName: String, values: Seq[Seq[String]]): Seq[GluePartitionError] = synchronized {
    record("BatchDeletePartition", values.size)
    if (values.size > GlueLimits.BatchDeletePartitions)
      throw new IllegalArgumentException(
        s"BatchDeletePartition accepts at most ${GlueLimits.BatchDeletePartitions} keys, got ${values.size}")
    values.flatMap { v =>
      if (parts.remove((databaseName, tableName, v)).isEmpty)
        Some(GluePartitionError(v, "EntityNotFoundException", "partition not found"))
      else None
    }
  }

  // ----------------------------------------------- state dump (spec oracle)

  def allDatabases: Seq[GDatabase] = synchronized(dbs.values.toSeq)
  def allTables: Seq[GTable] = synchronized(tables.values.toSeq)
  def allPartitions: Seq[GPartition] = synchronized(parts.values.toSeq)
}

object InMemoryGlueCatalog {
  private val registry = new ConcurrentHashMap[String, InMemoryGlueCatalog]()

  /** (Re)create a fresh empty catalog under `catalogId` — each spec/query run
    * starts from a clean service. */
  def fresh(catalogId: String, pageSize: Int = 100): InMemoryGlueCatalog = {
    val c = new InMemoryGlueCatalog(catalogId, pageSize)
    registry.put(catalogId, c)
    c
  }

  def get(catalogId: String): InMemoryGlueCatalog = {
    val c = registry.get(catalogId)
    require(c != null, s"no InMemoryGlueCatalog registered under '$catalogId'")
    c
  }
}

/** Registry lookup per task — the in-memory analogue of "build one SDK client
  * per executor". Serializable; carries only the catalog id. */
final case class InMemoryClientFactory(catalogId: String) extends GlueClientFactory {
  def client(): GlueCatalogClient = InMemoryGlueCatalog.get(catalogId)
}
