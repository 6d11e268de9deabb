package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog._
import graft.model._

/**
 * DataSourceV2 relation (`spark.read.format("glue-catalog")`) contract:
 * values equal the client's state, and — the part that matters at scale —
 * pushed filters change WHICH service calls are issued. Efficacy is asserted
 * from the mock's call log, not from the plan string alone.
 */
class GlueSourceV2Spec extends SparkSpec {
  import spark.implicits._

  /** 3 dbs × 4 tables × 5 partitions, page size 3 so every listing paginates:
    * dbs = 1 full page + 1 (3 items), tables/db = 2 pages (4 items),
    * partitions/table = 2 pages (5 items). */
  private def freshCatalog(id: String): InMemoryGlueCatalog = {
    val mock = InMemoryGlueCatalog.fresh(id, pageSize = 3)
    val dbs = Seq("sales", "ops", "sales_eu").map(n => GDatabase(n, description = Some(s"d-$n")))
    dbs.foreach(mock.createDatabase)
    for (d <- dbs; i <- 1 to 4)
      mock.createTable(GTable(s"t$i", d.name, owner = Some("o"), parameters = Map("k" -> s"$i")))
    for (d <- dbs; i <- 1 to 4)
      assert(mock.batchCreatePartitions(d.name, s"t$i",
        (1 to 5).map(v => GPartition(Seq(v.toString), d.name, s"t$i")))
        .isEmpty)
    mock.clearCallLog()
    mock
  }

  private def read(id: String, plane: String, opts: (String, String)*): DataFrame = {
    val r = spark.read.format("glue-catalog")
      .option("plane", plane).option("catalogId", id)
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load()
  }

  private def planString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("full scans of all three planes equal the service state") {
    val mock = freshCatalog("v2-full")
    assert(read("v2-full", "databases").as[GDatabase].collect().toSet ===
      mock.allDatabases.toSet)
    assert(read("v2-full", "tables").as[GTable].collect().toSet ===
      mock.allTables.toSet)
    assert(read("v2-full", "partitions").as[GPartition].collect().toSet ===
      mock.allPartitions.toSet)
  }

  test("databaseName equality prunes the per-db fan-out to point planning (no listing at all)") {
    val mock = freshCatalog("v2-dbeq")
    val q = read("v2-dbeq", "tables").where(col("databaseName") === "ops")
    val got = q.as[GTable].collect() // exactly ONE materialization, then audit the log
    assert(got.length === 4 && got.forall(_.databaseName == "ops"))
    // Pinned names bypass GetDatabases entirely; only ops's 2 table pages fetch.
    assert(mock.callCount("GetDatabases") === 0)
    assert(mock.callCount("GetTables") === 2, s"calls: ${mock.calls}")
    // The already-finalized plan (no re-collect) shows the absorbed filter.
    assert(q.queryExecution.executedPlan.toString.contains("EqualTo(databaseName,ops)"))
  }

  test("databaseName prefix match lists once, then fans out to matching dbs only") {
    val mock = freshCatalog("v2-prefix")
    val q = read("v2-prefix", "tables").where(col("databaseName").startsWith("sales"))
    assert(q.as[GTable].collect().map(_.databaseName).toSet === Set("sales", "sales_eu"))
    // 2 matching dbs × 2 pages; 'ops' never gets a GetTables chain.
    assert(mock.callCount("GetTables") === 4, s"calls: ${mock.calls}")
  }

  test("name equality collapses a table crawl to point GetTable calls") {
    val mock = freshCatalog("v2-point")
    val q = read("v2-point", "tables")
      .where(col("databaseName") === "sales" && col("name") === "t2")
    assert(q.as[GTable].collect().map(t => (t.databaseName, t.name)).toSeq === Seq(("sales", "t2")))
    assert(mock.callCount("GetDatabases") === 0)
    assert(mock.callCount("GetTables") === 0)
    assert(mock.callCount("GetTable") === 1, s"calls: ${mock.calls}")
  }

  test("partitions plane with db+table pinned issues exactly one partition chain") {
    val mock = freshCatalog("v2-parts")
    val q = read("v2-parts", "partitions")
      .where(col("databaseName") === "ops" && col("tableName") === "t3")
    assert(q.count() === 5)
    assert(mock.callCount("GetDatabases") === 0)
    assert(mock.callCount("GetTables") === 0)
    assert(mock.callCount("GetPartitions") === 2, s"calls: ${mock.calls}") // 5 rows / page 3
  }

  test("databases plane name equality uses a point GetDatabase") {
    val mock = freshCatalog("v2-db-point")
    val q = read("v2-db-point", "databases").where(col("name") === "sales")
    assert(q.as[GDatabase].collect().map(_.name).toSeq === Seq("sales"))
    assert(mock.callCount("GetDatabases") === 0)
    assert(mock.callCount("GetDatabase") === 1, s"calls: ${mock.calls}")
  }

  test("column pruning reaches the scan (payload columns never cross)") {
    freshCatalog("v2-prune")
    val q = read("v2-prune", "tables").select(col("name"), col("databaseName"))
    assert(q.distinct().count() === 12)
    // The scan LEAF must output only the pruned columns — payload (SD,
    // parameters, timestamps) never crosses out of the reader.
    val leaf = q.queryExecution.executedPlan.collectLeaves().head
    assert(leaf.output.map(_.name).toSet === Set("name", "databaseName"),
      s"scan not pruned: ${leaf.output.map(_.name)}\n$leaf")
  }

  test("segmented partition scan equals the unsegmented one") {
    freshCatalog("v2-seg")
    val whole = read("v2-seg", "partitions").as[GPartition].collect().toSet
    val seg = read("v2-seg", "partitions", "partitionSegments" -> "3")
      .as[GPartition].collect().toSet
    assert(seg === whole)
    assert(whole.size === 60)
  }

  test("V2 planes equal the imperative snapshot fetch") {
    val mock = freshCatalog("v2-snap-eq")
    val snap = GlueCatalogSource.snapshot(spark, InMemoryClientFactory("v2-snap-eq"))
    assert(read("v2-snap-eq", "databases").as[GDatabase].collect().toSet ===
      snap.databases.collect().toSet)
    assert(read("v2-snap-eq", "tables").as[GTable].collect().toSet ===
      snap.tables.collect().toSet)
    assert(read("v2-snap-eq", "partitions").as[GPartition].collect().toSet ===
      snap.partitions.collect().toSet)
    assert(mock.allTables.size === 12)
  }

  test("runtime (dynamic-pruning) filters from a broadcast join prune the service fan-out") {
    val mock = freshCatalog("v2-runtime")
    // The "replicate only the dbs today's messages name" shape: a tiny
    // filtered dimension joined on databaseName. DPP executes the broadcast
    // side first and hands the surviving keys to the scan as runtime
    // filters — only those dbs get a GetTables chain. The dim must NOT be a
    // LocalRelation (the optimizer folds the filter away and DPP sees no
    // selective predicate), so it's built over range().
    val dim = spark.range(2)
      .select(when(col("id") === 0, "ops").otherwise("absent_db").as("dbname"),
        col("id").as("flag"))
    val q = read("v2-runtime", "tables")
      .join(dim.where(col("flag") === 0), col("databaseName") === col("dbname"))
    val got = q.collect()
    assert(got.length === 4 && got.forall(_.getAs[String]("databaseName") == "ops"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"dynamic pruning did not engage:\n$plan")
    // Planning honored the runtime keys: one db's 2 table pages, no full fan-out.
    assert(mock.callCount("GetTables") === 2, s"calls: ${mock.calls}")
    // The executed plan's scan description names the runtime keys that did
    // the pruning — production diagnosis reads them out of the explain.
    assert(plan.contains("runtime=["), s"runtime filters invisible in:\n$plan")
  }

  test("runtime-filter pruning stays legal while the scan reports KeyGroupedPartitioning") {
    // The ADVICE-flagged interaction: s3_spj_counts arms v2 bucketing for
    // the rest of the session, so a later query can plan SPJ around this
    // scan AND prune it with a DPP/runtime filter. BatchScanExec's
    // runtime-filtering validation permits a SUBSET of the reported
    // partition values (pruned keys backfill as empty groups) — it throws
    // only if NEW values appear. This pins that the prune path executes,
    // answers correctly, and still fans out to one database only.
    val mock = freshCatalog("v2-rtspj")
    val prevBkt = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevReq = spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val dim = spark.range(2)
        .select(when(col("id") === 0, "ops").otherwise("absent_db").as("dbname"),
          col("id").as("flag"))
      val q = read("v2-rtspj", "tables")
        .join(dim.where(col("flag") === 0), col("databaseName") === col("dbname"))
      val got = q.collect()
      assert(got.length === 4 && got.forall(_.getAs[String]("databaseName") == "ops"))
      assert(mock.callCount("GetTables") === 2, s"calls: ${mock.calls}")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("runtime=["), s"runtime filters invisible in:\n$plan")
    } finally {
      prevBkt match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      prevReq match {
        case Some(v) => spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", v)
        case None => spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      }
    }
  }

  test("point-lookup statistics broadcast the pinned scan at plan time (no AQE rescue needed)") {
    freshCatalog("v2-stats")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // Big probe side: range stats (~80 MB) exceed the broadcast threshold,
      // so only the scan's own SupportsReportStatistics estimate (|pins| ×
      // 512 B) can elect the build side. Without it a V2 relation reports the
      // session default size and this plans a sort-merge join.
      val big = spark.range(10L * 1000 * 1000)
        .select(concat(lit("t"), (col("id") % 7) + 1).as("tname"), col("id").as("payload"))
      val pinned = read("v2-stats", "tables")
        .where(col("databaseName") === "sales" && col("name") === "t2")
        .select(col("name"), col("databaseName"))
      val q = big.join(pinned, col("tname") === col("name"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"pinned scan not broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"fell back to sort-merge:\n$plan")
      // ids ≡ 1 (mod 7) in [0, 1e7): 1_428_572 of them
      assert(q.count() === 1428572L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("plain SQL reaches the relation (CREATE TEMP VIEW USING glue-catalog) with pushdown intact") {
    val mock = freshCatalog("v2-sql")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW glue_tables
         USING `glue-catalog` OPTIONS (plane 'tables', catalogId 'v2-sql')""")
    val got = spark.sql(
      "SELECT databaseName, count(*) AS n FROM glue_tables WHERE databaseName = 'ops' GROUP BY 1")
      .collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("ops", 4L)))
    // The SQL route pushes the equality the same as the DataFrame route:
    // pinned planning, no GetDatabases listing.
    assert(mock.callCount("GetDatabases") === 0, s"calls: ${mock.calls}")
    assert(mock.callCount("GetTables") === 2, s"calls: ${mock.calls}")
  }

  test("pushed limit stops each slice's pagination early (no full crawl for limit 5)") {
    val mock = freshCatalog("v2-limit")
    // partitions plane, one slice per db: each slice satisfies take(5) from
    // its first table's 2 pages (pageSize 3) — 2 GetPartitions calls per db
    // instead of the full 8 (4 tables × 2 pages); GetTables stops after its
    // first page too.
    val got = read("v2-limit", "partitions").limit(5).collect()
    assert(got.length === 5)
    assert(mock.callCount("GetPartitions") <= 6, s"calls: ${mock.calls}")
    assert(mock.callCount("GetPartitions") >= 2, s"calls: ${mock.calls}")
    assert(mock.callCount("GetTables") <= 3, s"calls: ${mock.calls}")
  }

  private def copyPlane(srcId: String, dstId: String, plane: String,
      prep: DataFrame => DataFrame = identity): Unit =
    prep(read(srcId, plane)).write.format("glue-catalog")
      .option("plane", plane).option("catalogId", dstId).mode("append").save()

  test("append writes replicate a catalog through pure DataFrame code") {
    freshCatalog("v2-wsrc")
    val dst = InMemoryGlueCatalog.fresh("v2-wdst")
    copyPlane("v2-wsrc", "v2-wdst", "databases")
    copyPlane("v2-wsrc", "v2-wdst", "tables")
    // Co-locating each table's rows keeps the per-writer buffers to one key
    // run each — 12 (db, table) keys → exactly 12 BatchCreatePartition calls.
    copyPlane("v2-wsrc", "v2-wdst", "partitions",
      _.repartition(col("databaseName"), col("tableName")))
    val src = InMemoryGlueCatalog.get("v2-wsrc")
    assert(dst.allDatabases.toSet === src.allDatabases.toSet)
    assert(dst.allTables.toSet === src.allTables.toSet)
    assert(dst.allPartitions.toSet === src.allPartitions.toSet)
    assert(dst.callCount("BatchCreatePartition") === 12, s"calls: ${dst.calls}")
  }

  test("append is an idempotent upsert: replaying every plane converges") {
    freshCatalog("v2-wid-src")
    val dst = InMemoryGlueCatalog.fresh("v2-wid-dst")
    for (_ <- 1 to 2; plane <- Seq("databases", "tables", "partitions"))
      copyPlane("v2-wid-src", "v2-wid-dst", plane)
    assert(dst.allDatabases.size === 3)
    assert(dst.allTables.size === 12)
    assert(dst.allPartitions.size === 60)
  }

  test("table append updates an existing table (create-or-update fallback)") {
    freshCatalog("v2-wup")
    val changed = InMemoryGlueCatalog.get("v2-wup").allTables.head.copy(owner = Some("new-owner"))
    spark.createDataset(Seq(changed))(graft.codec.Codecs.tableEncoder).toDF()
      .write.format("glue-catalog")
      .option("plane", "tables").option("catalogId", "v2-wup").mode("append").save()
    assert(InMemoryGlueCatalog.get("v2-wup")
      .getTable(changed.databaseName, changed.name).get.owner === Some("new-owner"))
  }

  test("table append into an empty catalog creates the parent database implicitly") {
    freshCatalog("v2-wimp-src")
    val dst = InMemoryGlueCatalog.fresh("v2-wimp-dst")
    copyPlane("v2-wimp-src", "v2-wimp-dst", "tables") // no databases written first
    assert(dst.allTables.size === 12)
    assert(dst.allDatabases.map(_.name).toSet === Set("sales", "ops", "sales_eu"))
  }

  test("overwrite mode is rejected (a catalog is not truncatable)") {
    freshCatalog("v2-wov")
    val e = intercept[Exception] {
      read("v2-wov", "databases").write.format("glue-catalog")
        .option("plane", "databases").option("catalogId", "v2-wov")
        .mode("overwrite").save()
    }
    assert(e.getMessage.toLowerCase.contains("truncate")
      || e.getMessage.toLowerCase.contains("overwrite"), e.getMessage)
  }

  test("storage-partitioned join: tables ⨝ partitions co-locates on databaseName with ZERO exchange") {
    val mock = freshCatalog("v2-spj")
    val prevBkt = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevReq = spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the planes key-group on databaseName while the join also equates the
    // table name — partition keys ⊂ join keys is exactly what this knob
    // admits (co-location on a prefix of the join keys is still correct;
    // the residual key equality evaluates inside the merge)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      // partitionSegments=2: several slices per db — Spark must GROUP them
      // into key groups before matching the sides
      val tables = read("v2-spj", "tables")
        .select(col("databaseName"), col("name"), col("owner"))
      val parts = read("v2-spj", "partitions", "partitionSegments" -> "2")
        .select(col("databaseName").as("p_db"), col("tableName"), col("values"))
      val joined = tables.join(parts,
        col("databaseName") === col("p_db") && col("name") === col("tableName"))
        .groupBy(col("databaseName"), col("name"))
        .agg(count(lit(1)).as("n_parts"))
      val rows = joined.collect()
      assert(rows.length === 12 && rows.forall(_.getAs[Long]("n_parts") == 5L))
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      // the join itself must consume the reported KeyGroupedPartitioning:
      // no Exchange below the join — the only exchange allowed is the
      // final aggregation's (over the tiny grouped frame)
      val joinSection = plan.linesIterator.dropWhile(l => !l.contains("SortMergeJoin")).mkString("\n")
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"catalog-plane join still exchanges below the join:\n$plan")
      // both planes were fetched with their normal service fan-out
      assert(mock.callCount("GetPartitions") > 0)
    } finally {
      prevBkt match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
      prevReq match {
        case Some(v) => spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", v)
        case None => spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      }
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("unsupported filters are left for Spark to evaluate (and results stay correct)") {
    freshCatalog("v2-resid")
    // owner is not a pushable attribute; retention>=0 is a non-string filter.
    val q = read("v2-resid", "tables")
      .where(col("databaseName") === "sales" && col("owner") === "o" && col("retention") >= 0)
    assert(q.count() === 4)
    val plan = planString(q)
    assert(plan.contains("EqualTo(databaseName,sales)"), s"db filter not pushed:\n$plan")
  }
}
