package graft

import org.apache.spark.sql.functions._

import graft.codec.Codecs._
import graft.model._
import graft.operators.{Applier, Importer}

/**
 * Decision-table specs (SURVEY §5.2.2) — the reference's replication state
 * machines from README.md:259-273, enumerated case by case against in-memory
 * planes.
 */
class ImporterDecisionSpec extends SparkSpec {
  import spark.implicits._

  private def dbs(names: String*) = spark.createDataset(names.map(n => GDatabase(n)))
  private def tbls(keys: (String, String)*) =
    spark.createDataset(keys.map { case (db, t) => GTable(name = t, databaseName = db) })
  private def parts(rows: (String, String, Seq[String])*) =
    spark.createDataset(rows.map { case (db, t, v) => GPartition(v, db, t) })

  private def actionsOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.select(col("name"), col("action")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  // --- databases: exists → skip, absent → create (README.md:261-262) ---

  test("database decision table: exists→skip, absent→create") {
    val acts = actionsOf(Importer.diffDatabases(dbs("present", "absent"), dbs("present", "unrelated")))
    assert(acts == Map("present" -> Action.Skip, "absent" -> Action.Create))
  }

  test("database decision table: empty target creates everything, empty source does nothing") {
    assert(actionsOf(Importer.diffDatabases(dbs("a", "b"), dbs()))
      == Map("a" -> Action.Create, "b" -> Action.Create))
    assert(Importer.diffDatabases(dbs(), dbs("a")).count() == 0)
  }

  // --- tables: exists → update, absent → create (README.md:263-264) ---

  test("table decision table: exists→update, absent→create; target-only untouched") {
    val diff = Importer.diffTables(
      tbls("db" -> "existing", "db" -> "new_table"),
      tbls("db" -> "existing", "db" -> "target_only"))
    val acts = actionsOf(diff)
    assert(acts == Map("existing" -> Action.Update, "new_table" -> Action.Create))
    // the reference never deletes tables — target-only rows stay after apply
    val applied = Applier.applyTables(tbls("db" -> "existing", "db" -> "target_only"), diff)
    assert(applied.select("name").as[String].collect().toSet
      == Set("existing", "target_only", "new_table"))
  }

  // --- partitions: the 4-case matrix (README.md:266-273), wholesale mode ---

  private def partActions(src: Seq[(String, String, Seq[String])],
      tgt: Seq[(String, String, Seq[String])],
      exported: Seq[(String, String)] = Seq("db" -> "t")) = {
    val exportedDf = exported.toDF("databaseName", "tableName")
    Importer.reconcilePartitionsForTables(exportedDf, parts(src: _*), parts(tgt: _*))
      .select(col("action"), element_at(col("values"), 1).as("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
  }

  test("partition case 1: export ∅, target ∅ → no action") {
    assert(partActions(Seq(), Seq()).isEmpty)
  }

  test("partition case 2: export ∅, target has partitions → delete all target") {
    // a table message with ZERO partitions still wholesale-deletes
    assert(partActions(Seq(), Seq(("db", "t", Seq("p1")), ("db", "t", Seq("p2"))))
      == Seq(("delete", "p1"), ("delete", "p2")))
  }

  test("partition case 3: export has partitions, target ∅ → create all") {
    assert(partActions(Seq(("db", "t", Seq("p1"))), Seq())
      == Seq(("create", "p1")))
  }

  test("partition case 4: both non-empty → delete ALL target then create ALL export (wholesale, not a diff)") {
    assert(partActions(
      Seq(("db", "t", Seq("p1")), ("db", "t", Seq("p2"))),
      Seq(("db", "t", Seq("p2")), ("db", "t", Seq("p3"))))
      == Seq(("create", "p1"), ("create", "p2"), ("delete", "p2"), ("delete", "p3")))
  }

  test("partition scoping: unexported tables in the target are untouched") {
    val acts = partActions(
      Seq(("db", "t", Seq("p1"))),
      Seq(("db", "other", Seq("keep_me")), ("db", "t", Seq("old"))),
      exported = Seq("db" -> "t"))
    assert(acts == Seq(("create", "p1"), ("delete", "old")))
  }

  test("minimal-diff mode reaches the same end state with less churn") {
    val src = parts(("db", "t", Seq("p1")), ("db", "t", Seq("p2")))
    val tgt = parts(("db", "t", Seq("p2")), ("db", "t", Seq("p3")))
    val whole = Importer.reconcilePartitions(src, tgt, minimalDiff = false)
    val minimal = Importer.reconcilePartitions(src, tgt, minimalDiff = true)
    assert(minimal.count() < whole.count())
    val endWhole = Applier.applyPartitions(tgt, whole)
      .select(element_at(col("values"), 1)).as[String].collect().toSet
    val endMin = Applier.applyPartitions(tgt, minimal)
      .select(element_at(col("values"), 1)).as[String].collect().toSet
    assert(endWhole == Set("p1", "p2"))
    assert(endMin == endWhole)
  }

  test("incremental diff: equal maps in different entry order still skip; content changes update") {
    import org.apache.spark.sql.functions._
    val base = GTable("t1", "db", owner = Some("o"),
      parameters = Map("a" -> "1", "b" -> "2", "c" -> "3"))
    val reordered = base.copy(parameters = Map("c" -> "3", "b" -> "2", "a" -> "1"))
    val changed = base.copy(parameters = Map("a" -> "1", "b" -> "2", "c" -> "DIFFERENT"))
    val fresh = GTable("t2", "db")
    // createTime differs too — catalog-managed, must NOT force an update
    val staleTimes = base.copy(createTimeMs = Some(123L))

    val src = spark.createDataset(Seq(base, fresh))
    val sameTgt = spark.createDataset(Seq(reordered))
    val byAction = Importer.diffTablesIncremental(src, sameTgt)
      .select(col("name"), col("action")).as[(String, String)].collect().toMap
    assert(byAction("t1") == Action.Skip) // map order is not content
    assert(byAction("t2") == Action.Create)

    val changedTgt = spark.createDataset(Seq(changed))
    val upd = Importer.diffTablesIncremental(spark.createDataset(Seq(base)), changedTgt)
      .select(col("action")).as[String].head()
    assert(upd == Action.Update)

    val timeTgt = spark.createDataset(Seq(staleTimes))
    val tSkip = Importer.diffTablesIncremental(spark.createDataset(Seq(base)), timeTgt)
      .select(col("action")).as[String].head()
    assert(tSkip == Action.Skip) // catalog-managed fields never count
  }

  test("minimal reconcile replaces content-changed partitions and lands the wholesale end state") {
    import org.apache.spark.sql.functions._
    def sd(loc: String) = Some(StorageDescriptor(location = Some(loc)))
    // parameters null throughout: wholesale recreates every row through the
    // P4 projection (parameters → null) while minimal leaves untouched rows
    // alone — null params isolate the SD-change behavior under test.
    def p(v: String, loc: String) =
      GPartition(Seq(v), "db", "t", storageDescriptor = sd(loc), parameters = null)
    val srcParts = Seq(
      p("p0", "s3://new"),  // changed in place
      p("p1", "s3://same"), // untouched
      p("p2", "s3://add")) // new
    val tgtParts = Seq(
      p("p0", "s3://old"),
      p("p1", "s3://same"),
      p("p3", "s3://gone")) // removed
    val src = spark.createDataset(srcParts)
    val tgt = spark.createDataset(tgtParts)

    val minimal = Importer.reconcilePartitions(src, tgt, minimalDiff = true)
    val byKey = minimal.select(element_at(col("values"), 1).as("v"), col("action"))
      .as[(String, String)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byKey("p0") == Seq(Action.Create, Action.Delete)) // replaced in place
    assert(!byKey.contains("p1"))                            // untouched → no churn
    assert(byKey("p2") == Seq(Action.Create))
    assert(byKey("p3") == Seq(Action.Delete))

    // end-state equality with wholesale, including the changed descriptor
    val minState = Applier.applyPartitions(tgt, minimal).collect().toSet
    val wholesale = Applier.applyPartitions(tgt,
      Importer.reconcilePartitions(src, tgt, minimalDiff = false)).collect().toSet
    assert(minState === wholesale)
    assert(minState.find(_.values == Seq("p0")).get.storageDescriptor.get.location === Some("s3://new"))
  }

  test("apply is idempotent under duplicate actions (at-least-once redelivery)") {
    val src = tbls("db" -> "t1", "db" -> "t2")
    val diff = Importer.diffTables(src, tbls())
    val once = Applier.applyTables(tbls(), diff)
    val twice = Applier.applyTables(once, Importer.diffTables(src, once))
    assert(once.count() == 2 && twice.count() == 2)
  }
}
