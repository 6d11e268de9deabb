package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics => V2Statistics, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{GlueCatalogClient, GlueClientFactory, GlueEntityNotFoundException, GluePage, GlueSegment, InMemoryClientFactory}
import graft.codec.Codecs
import graft.model._

/**
 * DataSourceV2 relation over a live Glue-style catalog: the idiomatic
 * `spark.read.format("glue-catalog")` surface for the same
 * [[graft.catalog.GlueCatalogClient]] contract [[graft.catalog.GlueCatalogSource]]
 * snapshots imperatively (SURVEY §4 flags this as the optional pushdown-aware
 * form — `SupportsPushDownFilters` on the source, not a custom Rule).
 *
 * Three planes, selected by the `plane` option:
 *  - `databases` → rows of [[GDatabase]] (reference scan: GlueUtil.java:84-105)
 *  - `tables`    → rows of [[GTable]]    (GlueUtil.java:202-228)
 *  - `partitions`→ rows of [[GPartition]] (GlueUtil.java:361-386)
 *
 * What pushdown buys at 100 TB metadata scale — filters Catalyst pushes into
 * this scan change WHICH service calls are issued, not just which rows
 * survive:
 *  - `databaseName = 'x'` on the tables/partitions planes prunes the per-db
 *    fan-out: only matching databases get GetTables/GetPartitions chains
 *    (the reference's planner-side prefix filter, GDCReplicationPlanner.java:
 *    70-81, placed at the earliest possible point);
 *  - an equality on the entity name collapses the paginated crawl to a POINT
 *    lookup (GetDatabase / GetTable / GetPartitions-on-one-table) — a 10k-db
 *    catalog answers `name = 'y'` with one call, not a full scan;
 *  - column pruning drops unused nested payload (storageDescriptor etc.)
 *    before rows cross into the query, so `select(name)` over a million
 *    partitions ships keys, not storage descriptors.
 *
 * Planning is metadata-scale on the driver (one paginated database listing,
 * exactly like GlueCatalogSource.snapshot); every GetTables/GetPartitions
 * pagination chain runs inside an executor task. `partitionSegments > 1`
 * splits each table's partition scan into disjoint service-side segments so
 * one million-partition table doesn't serialize behind a single token chain.
 *
 * Options:
 *  - `plane` (required): databases | tables | partitions
 *  - `catalogId`: registry key handed to the factory's String constructor
 *    (default factory: [[graft.catalog.InMemoryClientFactory]])
 *  - `factoryClass`: FQCN of a [[GlueClientFactory]] with a String or no-arg
 *    constructor — an AWS-SDK deployment plugs its adapter in here
 *  - `maxErrorRetry` (default 10), `retryDelayMs` (default 0): the reference's
 *    SDK retry policy (ExportDatabaseWithTables.java:76-77)
 *  - `partitionSegments` (default 1): parallel segments per table scan
 */
final class GlueCatalogV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "glue-catalog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GlueCatalogV2.schemaFor(GlueCatalogV2.planeOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GluePlaneTable(new CaseInsensitiveStringMap(properties))

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] object GlueCatalogV2 {
  val Planes: Set[String] = Set("databases", "tables", "partitions")

  def planeOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("plane")
    require(p != null && Planes.contains(p),
      s"glue-catalog requires option plane in ${Planes.mkString("/")}, got '$p'")
    p
  }

  def schemaFor(plane: String): StructType = plane match {
    case "databases" => Codecs.databaseSchema
    case "tables" => Codecs.tableSchema
    case "partitions" => Codecs.partitionSchema
  }

  /** Columns a filter may reference and still be absorbed by the scan: the
    * identity keys each plane's service calls are addressed by. */
  def pushableAttrs(plane: String): Set[String] = plane match {
    case "databases" => Set("name")
    case "tables" => Set("databasename", "name")
    case "partitions" => Set("databasename", "tablename")
  }

  def isPushable(f: Filter, attrs: Set[String]): Boolean = f match {
    case EqualTo(a, _: String) => attrs.contains(a.toLowerCase)
    case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) => attrs.contains(a.toLowerCase)
    case StringStartsWith(a, _) => attrs.contains(a.toLowerCase)
    case IsNotNull(a) => attrs.contains(a.toLowerCase)
    case _ => false
  }

  /** Evaluate one pushed filter against an entity's key fields. The scan
    * claims these filters as handled, so it must enforce them exactly —
    * the default case FAILS CLOSED: a filter shape accepted by isPushable
    * but missing here would otherwise be claimed as pushed (Spark never
    * re-evaluates it) yet silently treated as satisfied, producing wrong
    * results. An isPushable/eval mismatch must surface immediately. */
  def eval(f: Filter, get: String => Option[String]): Boolean = f match {
    case EqualTo(a, v) => get(a).contains(String.valueOf(v))
    case In(a, vs) => get(a).exists(x => vs.exists(v => String.valueOf(v) == x))
    case StringStartsWith(a, p) => get(a).exists(_.startsWith(p))
    case IsNotNull(a) => get(a).isDefined
    case other => throw new IllegalStateException(
      s"filter $other was pushed into the glue-catalog scan but eval cannot enforce it " +
        "(isPushable and eval are out of sync)")
  }

  def evalAll(fs: Array[Filter], get: String => Option[String]): Boolean =
    fs.forall(eval(_, get))

  /** The exact name set an attribute is pinned to by equality filters, if
    * any — what turns a paginated crawl into point lookups. Multiple
    * equalities intersect (conjunction). */
  def pinnedNames(fs: Array[Filter], attr: String): Option[Set[String]] = {
    val sets = fs.collect {
      case EqualTo(a, v: String) if a.equalsIgnoreCase(attr) => Set(v)
      case In(a, vs) if a.equalsIgnoreCase(attr) => vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  def buildFactory(options: CaseInsensitiveStringMap): GlueClientFactory = {
    val cls = Option(options.get("factoryClass"))
      .getOrElse(classOf[InMemoryClientFactory].getName)
    val c = Class.forName(cls)
    require(classOf[GlueClientFactory].isAssignableFrom(c),
      s"factoryClass $cls does not implement GlueClientFactory")
    c.getConstructors.find(_.getParameterTypes.toSeq == Seq(classOf[String])) match {
      case Some(ctor) =>
        val id = options.get("catalogId")
        require(id != null, s"factoryClass $cls takes a catalogId — set the catalogId option")
        ctor.newInstance(id).asInstanceOf[GlueClientFactory]
      case None =>
        c.getDeclaredConstructor().newInstance().asInstanceOf[GlueClientFactory]
    }
  }

  def retryOf(options: CaseInsensitiveStringMap): (Int, Long) =
    (options.getInt("maxErrorRetry", 10), options.getLong("retryDelayMs", 0L))
}

private[sources] final class GluePlaneTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  private val plane = GlueCatalogV2.planeOf(options)
  override def name(): String = s"glue-catalog/$plane"
  override def schema(): StructType = GlueCatalogV2.schemaFor(plane)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  private def merged(extra: CaseInsensitiveStringMap): CaseInsensitiveStringMap = {
    // Table properties under call-time options (the call wins).
    val m = new util.HashMap[String, String](options.asCaseSensitiveMap())
    m.putAll(extra.asCaseSensitiveMap())
    new CaseInsensitiveStringMap(m)
  }
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new GluePlaneScanBuilder(merged(scanOptions), plane)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo): org.apache.spark.sql.connector.write.WriteBuilder =
    new GluePlaneWriteBuilder(merged(info.options()), plane, info.schema())
}

private[sources] final class GluePlaneScanBuilder(options: CaseInsensitiveStringMap, plane: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GlueCatalogV2.schemaFor(plane)
  private var limit: Option[Int] = None

  /** A pushed limit stops each slice's lazy pagination after `n` rows — an
    * exploratory `load().limit(10)` over a million-partition catalog fetches
    * a couple of pages per slice, not the full crawl. Partial by contract
    * (per-partition), so Spark keeps its own global Limit above the scan. */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed: Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val attrs = GlueCatalogV2.pushableAttrs(plane)
    val (accepted, rejected) = filters.partition(GlueCatalogV2.isPushable(_, attrs))
    pushed = accepted
    rejected // Spark re-evaluates only what the scan did not absorb
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Catalyst hands the pruned top-level field set; nested pruning inside
    // storageDescriptor is not worth the complexity at metadata scale.
    if (requiredSchema.nonEmpty) required = requiredSchema
  }

  override def build(): Scan =
    new GluePlaneScan(options, plane, pushed, required, limit)
}

/** One planned slice of the scan. `dbName = None` means "the databases plane's
  * single listing chain"; partitions-plane slices carry their segment.
  *
  * `HasPartitionKey`: a per-db slice IS a key group of `databaseName` — the
  * storage-partitioned-join handle. Reporting it lets Spark group slices by
  * key and co-locate two catalog planes without exchanging either (the B1
  * bucketed-join win applied to the connector). */
private[sources] final case class GlueScanSlice(
    dbName: Option[String], segNo: Int, totalSegs: Int)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(dbName.getOrElse("")))
}

private[sources] final class GluePlaneScan(
    options: CaseInsensitiveStringMap,
    plane: String,
    compileTimeFilters: Array[Filter],
    prunedSchema: StructType,
    limit: Option[Int]) extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics with SupportsReportPartitioning {

  private val factory = GlueCatalogV2.buildFactory(options)
  private val (maxRetry, retryDelayMs) = GlueCatalogV2.retryOf(options)
  private val segments = {
    val n = options.getInt("partitionSegments", 1)
    require(n >= 1, s"partitionSegments must be >= 1, got $n"); n
  }

  /** Runtime (dynamic-pruning) filters arrive after the other join side has
    * executed — a broadcast of today's message keys prunes the service
    * fan-out the same way a literal predicate would. Best-effort by contract
    * (the join above still filters rows), so readers may ignore them; the
    * planning-time fan-out MUST honor them to deliver the pruning. */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty
  private def filters: Array[Filter] = compileTimeFilters ++ runtimeFilters

  override def filterAttributes(): Array[NamedReference] = (plane match {
    case "databases" => Seq("name")
    case "tables" => Seq("databaseName", "name")
    case "partitions" => Seq("databaseName", "tableName")
  })
    // Only columns that survived pruning: Spark's PartitionPruning rule
    // resolves these against readSchema() and throws (not skips) on a name
    // the projection dropped — a pruned scan must shrink its DPP surface.
    .filter(a => prunedSchema.fieldNames.exists(_.equalsIgnoreCase(a)))
    .map(Expressions.column).toArray

  override def filter(fs: Array[Filter]): Unit = {
    runtimeFilters = fs.filter(GlueCatalogV2.isPushable(_, GlueCatalogV2.pushableAttrs(plane)))
    // Runtime filters shrink the fan-out — re-plan. This is legal even
    // while the scan reports KeyGroupedPartitioning (v2 bucketing defaults
    // ON in Spark 4, so SPJ may be planned around this scan):
    // BatchScanExec's runtime-filtering validation explicitly permits "a
    // subset of partition values from the original" and backfills EMPTY
    // partitions for the pruned keys — it only throws when NEW values
    // appear or a partition stops implementing HasPartitionKey. A re-plan
    // here can only shrink the db set (filters narrow, never widen) and
    // every GlueScanSlice carries its partition key, so both throw
    // conditions are structurally unreachable.
    planned = null
  }

  override def readSchema(): StructType = prunedSchema
  override def toBatch: Batch = this
  override def description(): String = {
    // Runtime (dynamic-pruning) filters prune the actual service fan-out, so
    // the executed plan must show them — an explain taken after execution
    // carries runtime=[...] alongside the compile-time pushed=[...]
    val rt = runtimeFilters
    s"glue-catalog plane=$plane pushed=[${compileTimeFilters.mkString(", ")}]" +
      (if (rt.nonEmpty) s" runtime=[${rt.mkString(", ")}]" else "")
  }

  /**
   * Plan-time statistics (SupportsReportStatistics): without them a V2
   * relation reports the session default size (Long.MaxValue-ish), so a
   * 3-row pinned scan joined to a terabyte plane plans a sort-merge join
   * and only AQE can rescue it at runtime. Point lookups are countable from
   * the pushed filters alone — |pins| rows, no service call at planning:
   *  - databases: |name pins|
   *  - tables: |db pins| × |name pins| (upper bound — absent entities only
   *    shrink it), or |db pins| × `estimateRowsPerDatabase` when configured
   *  - partitions: |db pins| × |table pins| × `estimateRowsPerTable` (the
   *    per-table partition count is service-side; the option is the
   *    deployment's known order of magnitude)
   * Unknowable shapes report empty and keep the conservative default.
   */
  override def estimateStatistics(): V2Statistics = {
    val fs = filters
    def pins(attr: String): Option[Long] =
      GlueCatalogV2.pinnedNames(fs, attr).map(_.size.toLong)
    val rows: Option[Long] = plane match {
      case "databases" => pins("name")
      case "tables" =>
        val perDb = Option(options.get("estimateRowsPerDatabase")).map(_.toLong)
        pins("databaseName").flatMap(d => pins("name").map(d * _).orElse(perDb.map(d * _)))
      case "partitions" =>
        // A single pinned table can still hold a million partitions — never
        // guess a per-table count; only a configured estimate bounds it.
        val perTable = Option(options.get("estimateRowsPerTable")).map(_.toLong)
        for (d <- pins("databaseName"); t <- pins("tableName"); p <- perTable)
          yield d * t * p
    }
    new V2Statistics {
      override def sizeInBytes(): util.OptionalLong =
        rows.fold(util.OptionalLong.empty)(r => util.OptionalLong.of(r * GluePlaneScan.RowWidthBytes))
      override def numRows(): util.OptionalLong =
        rows.fold(util.OptionalLong.empty)(util.OptionalLong.of)
    }
  }

  /** Planned once per scan (planInputPartitions AND outputPartitioning need
    * the db fan-out; runtime filters arriving later re-plan via the
    * invalidation in filter()). */
  @volatile private var planned: Array[InputPartition] = _

  override def planInputPartitions(): Array[InputPartition] = {
    if (planned == null) planned = doPlan()
    planned
  }

  private def doPlan(): Array[InputPartition] = plane match {
    case "databases" =>
      // One listing chain; name-equality collapses to point gets reader-side.
      Array(GlueScanSlice(None, 0, 1))
    case "tables" | "partitions" =>
      // The driver lists databases once (metadata scale) and applies the
      // pushed databaseName predicates BEFORE planning the per-db fan-out —
      // pruned databases never get a GetTables/GetPartitions chain at all.
      val client = GlueCatalogClient.withRetry(factory.client(), maxRetry, retryDelayMs)
      val dbNames = GlueCatalogV2.pinnedNames(filters, "databaseName") match {
        case Some(pins) => pins.toSeq.sorted // no listing call needed at all
        case None =>
          GlueCatalogClient.paginate(client.getDatabases).map(_.name)
            .filter(n => GlueCatalogV2.evalAll(
              filters.filter(f => GlueCatalogV2.isPushable(f, Set("databasename"))),
              a => if (a.equalsIgnoreCase("databaseName")) Some(n) else None))
      }
      val segs = if (plane == "partitions") 0 until segments else Seq(0)
      val total = if (plane == "partitions") segments else 1
      (for (db <- dbNames; s <- segs) yield GlueScanSlice(Some(db), s, total)).toArray
  }

  /**
   * Storage-partitioned-join surface (`SupportsReportPartitioning`): the
   * tables and partitions planes are planned as per-database slices, so the
   * scan's output IS key-grouped on `databaseName`. Reporting that lets a
   * tables⨝partitions (or any catalog-plane self-join) whose join keys
   * include `databaseName` plan with ZERO exchange on either side — the
   * service-call layout is the co-partitioning, exactly the B1 ingest-time
   * bucketing win applied to the connector. Requires
   * `spark.sql.sources.v2.bucketing.enabled=true` (Spark groups the
   * per-(db, segment) slices into key groups); `GlueSourceV2Spec` pins the
   * no-Exchange plan. Not reported when `databaseName` was pruned away (the
   * partitioning expression must resolve against readSchema).
   */
  override def outputPartitioning(): Partitioning =
    if (plane != "databases" &&
        prunedSchema.fieldNames.exists(_.equalsIgnoreCase("databaseName"))) {
      val uniqueDbs = planInputPartitions().map(_.asInstanceOf[GlueScanSlice].dbName).distinct.length
      new KeyGroupedPartitioning(Array(Expressions.identity("databaseName")), uniqueDbs)
    } else new UnknownPartitioning(0)

  override def createReaderFactory(): PartitionReaderFactory =
    new GluePlaneReaderFactory(plane, factory, maxRetry, retryDelayMs, filters, prunedSchema, limit)
}

private[sources] object GluePlaneScan {
  /** Conservative serialized-entity width for the stats estimate: catalog
    * rows are name strings + a storageDescriptor struct — hundreds of bytes,
    * not kilobytes. Over-estimating 4× still leaves a point lookup far under
    * any broadcast threshold; what matters is the orders of magnitude. */
  val RowWidthBytes: Long = 512L
}

private[sources] final class GluePlaneReaderFactory(
    plane: String,
    factory: GlueClientFactory,
    maxRetry: Int,
    retryDelayMs: Long,
    filters: Array[Filter],
    prunedSchema: StructType,
    limit: Option[Int]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GluePlaneReader(partition.asInstanceOf[GlueScanSlice], plane,
      factory, maxRetry, retryDelayMs, filters, prunedSchema, limit)
}

private[sources] final class GluePlaneReader(
    slice: GlueScanSlice,
    plane: String,
    factory: GlueClientFactory,
    maxRetry: Int,
    retryDelayMs: Long,
    filters: Array[Filter],
    prunedSchema: StructType,
    limit: Option[Int]) extends PartitionReader[InternalRow] {

  private val client = GlueCatalogClient.withRetry(factory.client(), maxRetry, retryDelayMs)

  /** Lazy pagination: one page in memory per chain, so a million-partition
    * segment streams through the task at page granularity. */
  private def paged[T](fetch: Option[String] => GluePage[T]): Iterator[T] =
    new Iterator[T] {
      private var page = fetch(None)
      private var it = page.items.iterator
      def hasNext: Boolean = {
        while (!it.hasNext && page.nextToken.isDefined) {
          page = fetch(Some(page.nextToken.get)); it = page.items.iterator
        }
        it.hasNext
      }
      def next(): T = { if (!hasNext) throw new NoSuchElementException; it.next() }
    }

  private def convert[T](enc: org.apache.spark.sql.Encoder[T]): T => InternalRow = {
    // Encoders.product returns an AgnosticEncoder at runtime; ExpressionEncoder
    // turns it into the serializer that writes the case class as an InternalRow.
    val exprEnc = ExpressionEncoder(
      enc.asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[T]])
    val ser = exprEnc.createSerializer()
    val full = exprEnc.schema
    val proj = UnsafeProjection.create(prunedSchema.fieldNames.toIndexedSeq.map { n =>
      val i = full.fieldIndex(n)
      BoundReference(i, full(i).dataType, full(i).nullable)
    })
    (t: T) => proj(ser(t))
  }

  private def notFoundAsEmpty[T](body: => Iterator[T]): Iterator[T] =
    // Same entity semantics as GlueCatalogSource: a database/table that
    // vanished between planning and this task's fetch is an empty slice,
    // not a failure (the real API throws, never returns an empty page).
    try body catch { case _: GlueEntityNotFoundException => Iterator.empty }

  // `take` composes with the lazy pagination: once `limit` rows surfaced,
  // no further page is ever requested from the service.
  private val rows: Iterator[InternalRow] = limit.fold(planeRows)(n => planeRows.take(n))

  private def planeRows: Iterator[InternalRow] = plane match {
    case "databases" =>
      val conv = convert(Codecs.dbEncoder)
      val get = (d: GDatabase) => (a: String) => if (a.equalsIgnoreCase("name")) Some(d.name) else None
      val source = GlueCatalogV2.pinnedNames(filters, "name") match {
        // notFoundAsEmpty on the point gets too: the in-memory client maps
        // absence to None, but a real SDK adapter may surface
        // EntityNotFoundException — a pinned name that vanished is an empty
        // slice here exactly as it is on the listing path.
        case Some(pins) => pins.toSeq.sorted.iterator
          .flatMap(n => notFoundAsEmpty(client.getDatabase(n).iterator))
        case None => paged(client.getDatabases)
      }
      source.filter(d => GlueCatalogV2.evalAll(filters, get(d))).map(conv)

    case "tables" =>
      val db = slice.dbName.get
      val conv = convert(Codecs.tableEncoder)
      val get = (t: GTable) => (a: String) => a.toLowerCase match {
        case "databasename" => Some(t.databaseName)
        case "name" => Some(t.name)
        case _ => None
      }
      val source = GlueCatalogV2.pinnedNames(filters, "name") match {
        // Wrapped like the listing path: an SDK adapter throwing
        // EntityNotFound for the table OR its absent parent database must
        // yield an empty slice, not a task failure.
        case Some(pins) => pins.toSeq.sorted.iterator
          .flatMap(n => notFoundAsEmpty(client.getTable(db, n).iterator))
        case None => notFoundAsEmpty(paged(client.getTables(db, _)))
      }
      source.filter(t => GlueCatalogV2.evalAll(filters, get(t))).map(conv)

    case "partitions" =>
      val db = slice.dbName.get
      val conv = convert(Codecs.partitionEncoder)
      val get = (p: GPartition) => (a: String) => a.toLowerCase match {
        case "databasename" => Some(p.databaseName)
        case "tablename" => Some(p.tableName)
        case _ => None
      }
      val seg = if (slice.totalSegs == 1) None else Some(GlueSegment(slice.segNo, slice.totalSegs))
      // tableName equalities prune the GetTables enumeration to point names —
      // `databaseName = d AND tableName = t` issues exactly one partition
      // chain with NO table listing.
      val tableNames: Iterator[String] = GlueCatalogV2.pinnedNames(filters, "tableName") match {
        case Some(pins) => pins.toSeq.sorted.iterator
        case None => notFoundAsEmpty(paged(client.getTables(db, _))).map(_.name)
      }
      tableNames
        .flatMap(t => notFoundAsEmpty(paged(client.getPartitions(db, t, _, seg))))
        .filter(p => GlueCatalogV2.evalAll(filters, get(p))).map(conv)
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
