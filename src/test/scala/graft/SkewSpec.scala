package graft

import org.apache.spark.sql.functions._

import graft.catalog._
import graft.codec.Codecs
import graft.model._
import graft.operators.Importer

/**
 * Skew discipline for the CATALOG joins (the pair-finders all have flood
 * specs; these are the replication-plane equivalents). The degenerate
 * catalog — one database/table holding ~90% of a 100k-partition plane — is
 * exactly why the reference grew its large-table S3 detour; the Spark planes
 * must survive it structurally:
 *
 *  - the reconcile join keys on the FULL identity (databaseName, tableName,
 *    values), so a mega-table's rows hash-spread evenly — no task reads more
 *    than 2× the mean;
 *  - the live batch sink clusters on (databaseName, tableName), which DOES
 *    serialize a mega-table behind one task at salt 1 — `GlueSinkConfig
 *    .partitionSalt` fans each table over N tasks while keeping
 *    same-identity delete+create co-located (salt = f(values)) so the
 *    delete-first ordering still holds.
 */
object SkewSpec {
  // object-level so range().map closures stay serializable (no spec capture).
  // The tag lives in the STORAGE DESCRIPTOR location: partition parameters
  // are dropped by the P4 projection and never count for diff or apply.
  def part(db: String, tbl: String, v: Int, tag: String = "a"): GPartition =
    GPartition(Seq(v.toString), db, tbl,
      storageDescriptor = Some(StorageDescriptor(location = Some(s"s3://bucket/$tag/$v"))))
}

class SkewSpec extends SparkSpec {
  import spark.implicits._
  import SkewSpec.part

  /** 100k-partition plane, 90% in one table: megadb.megatable 0..89999 plus
    * 10 ordinary tables of 1k partitions each. */
  private def degeneratePlane(tag: String) = {
    implicit val enc = Codecs.partitionEncoder
    spark.range(100000).map { i =>
      if (i < 90000) SkewSpec.part("megadb", "megatable", i.toInt, tag)
      else SkewSpec.part(s"db${i % 10}", s"t${i % 10}", i.toInt, tag)
    }
  }

  test("AQE splits a planted skewed join partition (skew=true in the final plan)") {
    import spark.implicits._
    // 95% of the fact rows share one key; the dim side is uniform. With the
    // skew thresholds lowered to fixture scale, OptimizeSkewedJoin must
    // split the hot partition into parallel sub-reads instead of letting
    // one task sort-merge the whole hot key.
    val conf = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // the post-join aggregation needs its own exchange either way; without
      // force, AQE vetoes the split for "introducing" that exchange
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(200000)
        .select(when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
          // incompressible ~128-byte payload so the map-output statistics
          // actually see the hot partition's bytes
          concat(md5(col("id").cast("string")), md5((col("id") + 1).cast("string")),
            md5((col("id") + 2).cast("string")), md5((col("id") + 3).cast("string"))).as("pay"))
      val dim = spark.range(1000).select(col("id").as("k"), col("id").cast("string").as("v"))
      // the agg must consume `pay`, or column pruning strips the payload
      // before the shuffle and no partition is skewed by bytes
      val j = fact.join(dim, "k").groupBy(col("v"))
        .agg(count(lit(1)).as("n"), max(length(col("pay"))).as("w"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("j3 reconcile of a 90%-skewed 100k-partition catalog balances: no task holds > 2x the mean") {
    val coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // AQE's small-partition coalescing would legally fold this small fixture
    // into one task and make the balance assertion vacuous; the property
    // under test is the HASH spread of the join key at fixed parallelism.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val src = degeneratePlane("new")
      val tgt = degeneratePlane("old") // every row differs (param changed) → delete+create
      val plan = Importer.reconcilePartitions(src, tgt, minimalDiff = true)
      val perTask = plan
        .withColumn("pid", spark_partition_id())
        .groupBy("pid").count()
        .select("count").as[Long].collect()
      assert(perTask.sum === 200000L) // 100k deletes + 100k creates
      val mean = perTask.sum.toDouble / perTask.length
      assert(perTask.length > 1, "fixture folded into one task — assertion vacuous")
      assert(perTask.max <= 2.0 * mean,
        s"skewed task: max ${perTask.max} vs mean $mean over ${perTask.length} tasks " +
          "(the identity-key shuffle should spread a mega-table evenly)")
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
  }

  test("salted live sink fans a mega-table's batch calls across tasks and keeps delete-first ordering") {
    implicit val enc = Codecs.partitionEncoder
    val salt = 16
    // At test scale AQE (correctly) coalesces the tiny salted shuffle back
    // into one task — production-sized buckets wouldn't coalesce. Pin the
    // structural fan-out for the assertion.
    val coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
    // 30k-create mega-table; the first 1000 identities ALSO carry a delete
    // (the minimal-reconcile changed-in-place shape: stale row must go first
    // or the freshly created one gets wiped).
    val creates = spark.range(30000).map(i => SkewSpec.part("megadb", "megatable", i.toInt, "new"))
      .withColumn("action", lit(Action.Create))
    val deletes = spark.range(1000).map(i => SkewSpec.part("megadb", "megatable", i.toInt, "stale"))
      .withColumn("action", lit(Action.Delete))

    val mock = InMemoryGlueCatalog.fresh("skew-salt")
    mock.createDatabase(GDatabase("megadb"))
    mock.createTable(GTable("megatable", "megadb"))
    // Pre-seed the 1000 stale rows the deletes target.
    (0 until 1000).grouped(GlueLimits.BatchCreatePartitions).foreach { g =>
      assert(mock.batchCreatePartitions("megadb", "megatable",
        g.map(part("megadb", "megatable", _, "stale"))).isEmpty)
    }
    mock.clearCallLog()

    val statuses = GlueSink.applyPartitions(
      deletes.toDF.unionByName(creates.toDF), InMemoryClientFactory("skew-salt"),
      GlueSinkConfig(partitionSalt = salt))
    assert(statuses.where(!col("ok")).count() === 0)

    // Convergence under salt: every identity present exactly once with the
    // NEW descriptor — a create racing ahead of its same-identity delete
    // would have left 1000 rows "stale" (delete runs last, wiping the new
    // row) or missing; co-located salt + delete-first sort forbids both.
    assert(mock.allPartitions.size === 30000)
    assert(mock.allPartitions.forall(_.storageDescriptor.exists(_.location.exists(_.contains("/new/")))))

    // Fan-out happened at the service-call level: one co-located chain packs
    // 30k creates into exactly 300 full batches; salting splits the table
    // over up to `salt` buckets, each rounding up its last chunk. More calls
    // than one chain proves the spread; the bound proves the packing cost
    // stays at worst salt-1 extra partial calls.
    val createCalls = mock.calls.count(_.op == "BatchCreatePartition")
    assert(createCalls > 300, s"only $createCalls create calls — mega-table not fanned out")
    assert(createCalls <= 300 + salt, s"$createCalls create calls — packing degraded beyond salt overhead")
    val deleteCalls = mock.calls.count(_.op == "BatchDeletePartition")
    assert(deleteCalls >= 40 && deleteCalls <= 40 + salt) // 1000/25 = 40 full batches
    } finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", coalesce)
  }

  test("salt 1 (default) keeps the strict single-chain packing the chunk audit pins") {
    implicit val enc = Codecs.partitionEncoder
    val creates = spark.range(250).map(i => SkewSpec.part("alpha", "big", i.toInt))
      .withColumn("action", lit(Action.Create))
    val mock = InMemoryGlueCatalog.fresh("skew-nosalt")
    mock.createDatabase(GDatabase("alpha"))
    mock.createTable(GTable("big", "alpha"))
    mock.clearCallLog()
    val statuses = GlueSink.applyPartitions(
      creates.toDF, InMemoryClientFactory("skew-nosalt"), GlueSinkConfig())
    assert(statuses.where(!col("ok")).count() === 0)
    assert(mock.calls.filter(_.op == "BatchCreatePartition").map(_.batchSize).sorted === Seq(50, 100, 100))
  }
}
