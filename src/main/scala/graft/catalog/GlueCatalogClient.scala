package graft.catalog

import graft.model._

/**
 * The Glue Data Catalog API contract the reference programs against,
 * re-expressed as a minimal Scala trait — the seam between the Spark planes
 * (CatalogSnapshot source / ChunkedSink sink) and a live catalog service.
 *
 * Method set and semantics mirror the reference's GlueUtil call surface:
 *  - paginated reads: GetDatabases / GetTables / GetPartitions with a
 *    nextToken loop (GlueUtil.java:84-105, 202-228, 361-386);
 *  - point reads: GetDatabase / GetTable (GlueUtil.java:120-140, 283-292);
 *  - writes: CreateDatabase (GlueUtil.java:142-167), Create/UpdateTable with
 *    the skipArchive flag (GlueUtil.java:296-345), BatchCreatePartition
 *    (≤100/call, GlueUtil.java:406-420) and BatchDeletePartition (≤25/call,
 *    GlueUtil.java:500-512), both returning per-partition errors.
 *
 * Inputs are the writable projections (DatabaseInput/TableInput/
 * PartitionInput): callers pass entities already run through
 * graft.operators.Projection, and implementations must not expect the
 * catalog-managed fields (create/update times, createdBy) to survive.
 *
 * Implementations are constructed PER EXECUTOR via [[GlueClientFactory]] —
 * the trait itself is not Serializable; only the factory crosses the wire.
 * An AWS-SDK-backed implementation is a thin adapter from these methods onto
 * AWSGlue client calls; it is deliberately not in this repo (no SDK on the
 * classpath, zero egress) — [[InMemoryGlueCatalog]] implements the same
 * contract for tests and local runs.
 */
trait GlueCatalogClient {
  def catalogId: String

  def getDatabases(nextToken: Option[String]): GluePage[GDatabase]

  /** GetTables. Like the real API, throws [[GlueEntityNotFoundException]]
    * when `databaseName` is absent — NOT an empty page. Callers fetching
    * state for entities that may not exist yet (e.g. a pruned per-micro-batch
    * snapshot whose messages are about to CREATE them) must catch it and
    * treat the table set as empty; [[GlueCatalogSource]] does. */
  def getTables(databaseName: String, nextToken: Option[String]): GluePage[GTable]

  /** GetPartitions, optionally restricted to one [[GlueSegment]] — the
    * service's parallel-scan feature (public GetPartitions API: `Segment
    * {SegmentNumber, TotalSegments}`). The reference fetches serially
    * (GlueUtil.java:361-386); segments are what keep ONE million-partition
    * table from bounding snapshot time by a single pagination chain — the
    * source fans (db, table, segment) keys across executors.
    *
    * Like the real API, throws [[GlueEntityNotFoundException]] when the
    * database or table is absent — NOT an empty page. Source-side fetches
    * that name tables which may not exist on the target yet (every table a
    * micro-batch is about to create) catch it and treat the partition set as
    * empty ([[GlueCatalogSource]] does); it is an entity-semantics decision,
    * not a retryable fault, so [[GlueCatalogClient.withRetry]] rethrows it. */
  def getPartitions(databaseName: String, tableName: String, nextToken: Option[String],
      segment: Option[GlueSegment] = None): GluePage[GPartition]

  /** Point lookups return None for an absent entity. Implementations over
    * the real SDK MUST map EntityNotFoundException — including the case
    * where the PARENT database of a getTable is absent — to None rather
    * than rethrow: callers treat absence as an entity-semantics fact, and
    * the V2 scan additionally guards these with its notFoundAsEmpty so an
    * adapter that throws anyway degrades to an empty slice, not a failure. */
  def getDatabase(name: String): Option[GDatabase]
  def getTable(databaseName: String, name: String): Option[GTable]

  /** CreateDatabase with DatabaseInput semantics (name, description,
    * locationUri, parameters — the catalog stamps its own createTime).
    * Throws [[GlueAlreadyExistsException]] if present. */
  def createDatabase(db: GDatabase): Unit

  /** CreateTable with TableInput semantics. Throws
    * [[GlueEntityNotFoundException]] if the database is absent,
    * [[GlueAlreadyExistsException]] if the table exists. */
  def createTable(table: GTable): Unit

  /** UpdateTable; `skipArchive = false` archives the previous version first
    * (the write-amplification control of GlueUtil.java:292-294). Throws
    * [[GlueEntityNotFoundException]] if the table is absent. */
  def updateTable(table: GTable, skipArchive: Boolean): Unit

  /** BatchCreatePartition: at most [[GlueLimits.BatchCreatePartitions]] rows
    * per call (the service rejects more). Existing partitions surface as
    * per-partition AlreadyExistsException entries, not a thrown error. */
  def batchCreatePartitions(
      databaseName: String, tableName: String, parts: Seq[GPartition]): Seq[GluePartitionError]

  /** BatchDeletePartition: at most [[GlueLimits.BatchDeletePartitions]] keys
    * per call; identity is the ordered values list (GlueUtil.java:504-508). */
  def batchDeletePartitions(
      databaseName: String, tableName: String, values: Seq[Seq[String]]): Seq[GluePartitionError]
}

/** One page of a paginated read; `nextToken = None` ends the scan. */
final case class GluePage[T](items: Seq[T], nextToken: Option[String])

/** One slice of a segmented (parallel) partition scan; segments partition the
  * key space disjointly and cover it completely. */
final case class GlueSegment(segmentNumber: Int, totalSegments: Int) {
  require(totalSegments >= 1 && segmentNumber >= 0 && segmentNumber < totalSegments,
    s"invalid segment $segmentNumber/$totalSegments")
}

/** Per-partition failure inside a batch call (BatchCreatePartition /
  * BatchDeletePartition PartitionError entries). */
final case class GluePartitionError(values: Seq[String], errorCode: String, message: String)

/** Service API limits (fixed by the Glue API, not tunables) — single source
  * of truth is the sink-side ChunkedSink constants the fixture path already
  * uses; aliased here so the client contract and the mock's validation can
  * never disagree with the chunking code. */
object GlueLimits {
  val BatchCreatePartitions: Int = graft.operators.ChunkedSink.CreatePartitionChunk // GlueUtil.java:414-416
  val BatchDeletePartitions: Int = graft.operators.ChunkedSink.DeletePartitionChunk // GlueUtil.java:510-512
}

class GlueEntityNotFoundException(msg: String) extends RuntimeException(msg)
class GlueAlreadyExistsException(msg: String) extends RuntimeException(msg)
/** Retryable fault (throttling / 5xx) — the class the SDK's
  * `withMaxErrorRetry(10)` policy retries (ExportDatabaseWithTables.java:76-77). */
class GlueThrottlingException(msg: String) extends RuntimeException(msg)

/** Per-executor client construction: the factory is the only thing shipped in
  * task closures. A live deployment returns a lazily-built SDK client here
  * (one per executor JVM, reused across tasks); tests return registry-backed
  * in-memory clients. */
trait GlueClientFactory extends Serializable {
  def client(): GlueCatalogClient
}

object GlueCatalogClient {

  /** Drain a paginated read into one Seq — the reference's do/while nextToken
    * loop (GlueUtil.java:91-103) as a helper. Driver-side this is metadata
    * scale (database list); per-table loops run inside executor tasks. */
  def paginate[T](fetch: Option[String] => GluePage[T]): Seq[T] = {
    val out = Seq.newBuilder[T]
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val page = fetch(token)
      out ++= page.items
      token = page.nextToken
    }
    out.result()
  }

  /** Bounded retry on throttling faults — the client-level
    * `maxErrorRetry(10)` policy (ExportDatabaseWithTables.java:76-77;
    * DDBUtil.java:48-49). `maxErrorRetry` is the number of RE-tries after the
    * first attempt; backoff is linear in attempt count (`retryDelayMs *
    * attempt`), capped PROPORTIONAL to the configured delay at `retryDelayMs *
    * maxErrorRetry` — a caller configuring a 2 s base under sustained
    * throttling really waits up to 2 s × retries, not a silent 1 s ceiling —
    * and 0 ms in tests. Only [[GlueThrottlingException]] retries —
    * entity-semantics errors (not-found / already-exists) are decisions, not
    * faults. */
  def withRetry(underlying: GlueCatalogClient, maxErrorRetry: Int, retryDelayMs: Long = 0L): GlueCatalogClient =
    new GlueCatalogClient {
      private val maxDelayMs = retryDelayMs * math.max(maxErrorRetry, 1)
      private def retry[T](op: => T): T = {
        var attempt = 0
        while (true) {
          try return op
          catch {
            case e: GlueThrottlingException =>
              attempt += 1
              if (attempt > maxErrorRetry) throw e
              if (retryDelayMs > 0) Thread.sleep(math.min(retryDelayMs * attempt, maxDelayMs))
          }
        }
        throw new IllegalStateException("unreachable")
      }
      def catalogId: String = underlying.catalogId
      def getDatabases(t: Option[String]) = retry(underlying.getDatabases(t))
      def getTables(db: String, t: Option[String]) = retry(underlying.getTables(db, t))
      def getPartitions(db: String, tbl: String, t: Option[String], seg: Option[GlueSegment]) =
        retry(underlying.getPartitions(db, tbl, t, seg))
      def getDatabase(name: String) = retry(underlying.getDatabase(name))
      def getTable(db: String, name: String) = retry(underlying.getTable(db, name))
      def createDatabase(db: GDatabase): Unit = retry(underlying.createDatabase(db))
      def createTable(table: GTable): Unit = retry(underlying.createTable(table))
      def updateTable(table: GTable, skipArchive: Boolean): Unit = retry(underlying.updateTable(table, skipArchive))
      def batchCreatePartitions(db: String, tbl: String, parts: Seq[GPartition]) =
        retry(underlying.batchCreatePartitions(db, tbl, parts))
      def batchDeletePartitions(db: String, tbl: String, values: Seq[Seq[String]]) =
        retry(underlying.batchDeletePartitions(db, tbl, values))
    }
}
