package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan

import graft.model._
import graft.operators.Importer
import graft.sources.CatalogSnapshot

/**
 * Physical-plan regression audit: the scale properties the 100 TB design
 * depends on, asserted against the actual executed plans so a refactor that
 * silently drops a pushdown or broadcasts the wrong side fails CI — not a
 * perf round three weeks later.
 */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private def executedPlan(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize the plan
    df.queryExecution.executedPlan
  }

  private def planString(df: org.apache.spark.sql.DataFrame): String =
    executedPlan(df).toString

  test("adapted TPC-H plans: q6 filters reach the scan, q14 broadcasts part, q4 is a semi join") {
    val dir = "/root/testdata/sf0.001"
    val p6 = planString(SparkEntry.queries("q6_revenue_delta")(spark, dir))
    assert(p6.contains("PushedFilters") && p6.contains("l_shipdate"),
      s"q6 range predicate not pushed:\n$p6")
    val p14 = planString(SparkEntry.queries("q14_promo_share")(spark, dir))
    assert(p14.contains("BroadcastHashJoin"), s"q14 part dim not broadcast:\n$p14")
    val p4 = planString(SparkEntry.queries("q4_late_orders")(spark, dir))
    assert(p4.contains("LeftSemi"), s"q4 EXISTS not planned as semi join:\n$p4")
  }

  test("web-ingest chain is one shuffle-free codegen'd projection per row") {
    // normalize_text ∘ html_main_text compose inside a single
    // WholeStageCodegen scan-project stage: no Exchange, no Sort — the
    // ingest stage parallelizes embarrassingly at 100 TB
    val plan = planString(
      SparkEntry.queries("d_html_extract")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("Exchange"), s"html extract shuffles:\n$plan")
    assert(!plan.contains("Sort"), s"html extract sorts:\n$plan")
    // the "*(n)" prefix is the executedPlan-toString marker for operators
    // inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"extract fell out of codegen:\n$plan")
    val web = planString(
      SparkEntry.queries("d_web_ingest")(spark, "/root/testdata/sf0.001"))
    assert(!web.contains("Exchange"), s"web ingest shuffles:\n$web")
  }

  test("URL canonicalization chain is one shuffle-free codegen'd projection per row") {
    // url_normalize -> url_host -> url_registered_domain collapse into a
    // single WholeStageCodegen scan-project stage: the URL-hygiene stage
    // runs inside the ingest scan at 100 TB, before anything shuffles
    val plan = planString(
      SparkEntry.queries("d_url_normalize")(spark, "/root/testdata/sf0.001"))
    assert(!plan.contains("Exchange"), s"url normalize shuffles:\n$plan")
    assert(!plan.contains("Sort"), s"url normalize sorts:\n$plan")
    assert(plan.contains("*(1) Project"), s"url chain fell out of codegen:\n$plan")
  }

  test("URL dedup shuffles exactly once, on the canonical key") {
    // slice off the AQE "Initial Plan" section — it still shows the
    // pre-adaptive exchanges (the round-10 plan-string trap)
    val plan = planString(
      SparkEntry.queries("d_url_dedup")(spark, "/root/testdata/sf0.001"))
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected ONE hash exchange on the canonical url:\n$plan")
  }

  test("gopher gate evaluates the native kernel, never an interpreted HOF tree") {
    // the X70 regression class: a filter on `keep` must reference the
    // repetition_signals kernel (one O(m) call per row), not an inlined
    // higher-order-function tree that re-evaluates per array element
    val df = graft.functions.TextFunctions
      .repetitionSignals(spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"))
      .where(col("keep")).select(col("doc_id"))
    val plan = planString(df)
    assert(plan.contains("repetition_signals"), s"kernel missing from plan:\n$plan")
    assert(!plan.contains("transform("), s"HOF tree leaked into the plan:\n$plan")
    assert(!plan.contains("Exchange"), s"gopher gate shuffles:\n$plan")
  }

  test("X72 lang-id classify is a zero-shuffle codegen'd scan projection") {
    // the r13 scale-killer: the DataFrame NB classify was a full-corpus
    // explode → join → per-(doc,label) aggregate → argmax window (4.0 s at
    // sf0.1, 34.6 s at sf1). The kernel formulation must plan as a single
    // scan-project stage: model rides as a reference object, NO Exchange.
    val plan = planString(
      SparkEntry.queries("d_lang_id_ngram")(spark, "/root/testdata/sf0.001"))
    assert(plan.contains("nb_argmax"), s"kernel missing from plan:\n$plan")
    assert(!plan.contains("Exchange"), s"lang-id classify shuffles:\n$plan")
    assert(!plan.contains("Generate"), s"classify still explodes tokens:\n$plan")
    assert(!plan.contains("Window"), s"argmax window survived:\n$plan")
  }

  test("curate pipeline v2's lang gate adds no Exchange beyond the dedup + pack windows") {
    // gate-in-scan: exactly the two legitimate exchanges remain (the
    // content-hash dedup window and the per-source pack window); the NB
    // gate itself contributes none (r12 had THREE extra: classify agg +
    // argmax window + the doc_id join back)
    val plan = planString(
      SparkEntry.queries("d_curate_pipeline_v2")(spark, "/root/testdata/sf0.001"))
      .split("== Initial Plan ==")(0)
    assert(plan.contains("nb_argmax"), s"kernel missing from plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2,
      s"expected exactly dedup + pack exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"pipeline collapsed to one partition:\n$plan")
  }

  test("web pipeline plans every join hash-based — no cartesian, no nested loop") {
    // the X70 composition: gopher semi-gate, dedup anti-join and the meta
    // join must all stay equi-joins (broadcast here; SMJ at scale under
    // AQE) — a BroadcastNestedLoopJoin or CartesianProduct would mean a
    // non-equi pairing snuck into the chain
    val plan = planString(
      SparkEntry.queries("d_web_pipeline")(spark, "/root/testdata/sf0.001"))
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct"), s"pipeline went cartesian:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"pipeline joined non-equi:\n$plan")
    // X73 domain cap: ONE top_k_by aggregate produces the keep-list; the
    // cap must NOT plan as a window pass over the full gated plane (the
    // pack window stays the pipeline's only WindowExec)
    assert(plan.contains("top_k_by"), s"domain cap aggregate missing:\n$plan")
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1, s"expected only the pack window, got $windows:\n$plan")
  }

  test("frontier curation + re-crawl diff plan equi-joins only; rules plane broadcasts") {
    // X76+X74: the robots verdict must ride a BROADCAST of the tiny rules
    // plane; nothing in the composition may pair non-equi
    val frontier = planString(
      SparkEntry.queries("d_frontier_curate")(spark, "/root/testdata/sf0.001"))
      .split("== Initial Plan ==")(0)
    assert(frontier.contains("BroadcastHashJoin"), s"rules plane not broadcast:\n$frontier")
    assert(!frontier.contains("CartesianProduct") &&
      !frontier.contains("BroadcastNestedLoopJoin"),
      s"frontier curation paired non-equi:\n$frontier")
    // X77: the index diff is ONE equi full-outer join on url — index-line
    // scale, never a cartesian
    val diff = planString(
      SparkEntry.queries("d_cdx_recrawl")(spark, "/root/testdata/sf0.001"))
      .split("== Initial Plan ==")(0)
    assert(diff.contains("FullOuter"), s"diff lost the full-outer shape:\n$diff")
    assert(!diff.contains("CartesianProduct") &&
      !diff.contains("BroadcastNestedLoopJoin"),
      s"recrawl diff paired non-equi:\n$diff")
  }

  test("epoch shuffle plans as ONE exchange on (epoch, shard) + in-partition sort — no global sort") {
    // the production write shape: a total-order sort (RangePartitioning)
    // would be a cluster-wide bottleneck; the permutation only needs
    // per-shard order
    Seq("d_epoch_shuffle", "d_epoch_shuffle_256").foreach { q =>
      val plan = planString(
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001"))
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("rangepartitioning"),
        s"$q fell into a global total-order sort:\n$plan")
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 1, s"$q: expected ONE hash exchange on (epoch, shard):\n$plan")
    }
  }

  test("JDBC source reads in 4 stripes with the filter pushed to the database") {
    val q = SparkEntry.queries("src_jdbc_agg")(spark, "/root/testdata/sf0.001")
    val plan = planString(q)
    assert(plan.contains("JDBCRelation(supplier) [numPartitions=4]"),
      s"JDBC scan not striped:\n$plan")
    assert(plan.contains("PushedFilters") && plan.toUpperCase.contains("S_ACCTBAL"),
      s"acctbal filter not pushed into the stripe queries:\n$plan")
  }

  test("snapshot partition plane prunes by databaseName from the directory layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-snap").toString
    val parts = (0 until 100).map(i =>
      GPartition(Seq(i.toString), s"db${i % 5}", s"t${i % 10}"))
    CatalogSnapshot.writeParquet(
      CatalogSnapshot("c", spark.emptyDataset[GDatabase], spark.emptyDataset[GTable],
        spark.createDataset(parts)), dir)
    val snap = CatalogSnapshot.fromParquet(spark, "c", dir)
    val q = snap.partitionsOf("db3", "t3")
    val plan = planString(q.toDF())
    // databaseName is a directory-level partition column → PartitionFilters,
    // not a post-scan Filter; tableName is a data column → pushed to parquet.
    assert(plan.contains("PartitionFilters") && plan.contains("databaseName"),
      s"databaseName not pruned at the source:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("tableName"),
      s"tableName not pushed to the parquet scan:\n$plan")
    assert(q.collect().forall(p => p.databaseName == "db3" && p.tableName == "t3"))
  }

  test("parquet scans push predicates and prune columns (projection reaches ReadSchema)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-push").toString
    spark.range(1000)
      .select(col("id"), (col("id") % 7).as("k"), lit("pad").as("unused"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).where(col("k") > 3).select(col("id"))
    val plan = planString(q)
    assert(plan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,3)]"),
      s"filter not pushed:\n$plan")
    // column pruning: the scan must not read the 'unused' column
    assert(!plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("unused"),
      s"unused column read:\n$plan")
  }

  test("J1 database diff broadcasts the target-names side (no shuffle of src)") {
    val src = spark.createDataset((0 until 500).map(i => GDatabase(s"db$i")))
    val tgt = spark.createDataset((0 until 20).map(i => GDatabase(s"db$i")))
    val plan = planString(Importer.diffDatabases(src, tgt))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"target side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
  }

  test("sketch hot path stays inside WholeStageCodegen (no interpreted HOF fallback)") {
    graft.plans.SketchFunctions.register(spark)
    // spark.range (not a local Seq): a local relation would be constant-folded
    // into LocalTableScan and there'd be no codegen stage to audit
    val docs = spark.range(50).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon token"), col("id"), lit(" zeta")).as("text"))
    val sig = docs.select(
      graft.functions.Dedup.minhashSignature(col("text")).as("sig"),
      graft.functions.TextFunctions.shingleFingerprint(col("text")).as("fp"))
    val plan = planString(sig)
    // native expressions ride a codegen'd projection — `*(n)` marks
    // WholeStageCodegen stages in SparkPlan.toString — and none of the
    // interpreted lambda machinery appears
    assert(plan.contains("*("), s"no codegen stage:\n$plan")
    assert(!plan.contains("LambdaFunction") && !plan.contains("transform("),
      s"interpreted HOF leaked into the sketch path:\n$plan")
  }

  test("LSH-bucket-partitioned embedding layout prunes probed buckets at the source") {
    graft.plans.VectorFunctions.register(spark)
    val vecs = spark.range(200).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)),
        i => (pmod(col("id") * (i + lit(3)), lit(17)) / 17.0 - 0.5)).cast("array<float>").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-lsh").toString
    graft.functions.Similarity.withLshBuckets(vecs, dim = 8, nPlanes = 4)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val probed = spark.read.parquet(dir).where(col("bucket").isin(0L, 3L, 5L))
    val plan = planString(probed)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"probe set not pruned at the source:\n$plan")
    assert(probed.select("bucket").distinct().count() <= 3)
  }

  test("bucketed partition planes reconcile without shuffling either side") {
    val src = (0 until 400).map(i => GPartition(Seq(s"p$i"), s"db${i % 4}", s"t${i % 20}"))
    val tgt = (100 until 500).map(i => GPartition(Seq(s"p$i"), s"db${i % 4}", s"t${i % 20}"))
    CatalogSnapshot.writeBucketedPartitions(spark.createDataset(src), "plan_audit_src", buckets = 4)
    CatalogSnapshot.writeBucketedPartitions(spark.createDataset(tgt), "plan_audit_tgt", buckets = 4)
    val srcPlane = spark.table("plan_audit_src").as[GPartition]
    val tgtPlane = spark.table("plan_audit_tgt").as[GPartition]
    val q = Importer.reconcilePartitions(srcPlane, tgtPlane, minimalDiff = true)
    val plan = planString(q)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed reconcile still shuffles:\n$plan")
    assert(q.count() > 0)
  }

  test("hash sampling prunes to the selected columns at the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-sample").toString
    spark.range(500).select(col("id").as("doc_id"),
        concat(lit("text"), col("id")).as("text"), lit("s").as("source"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(graft.functions.TextFunctions.hashSample(col("doc_id"), 10))
      .select(col("doc_id"), col("source"))
    val plan = planString(q)
    // md5 over doc_id is not a pushable parquet predicate, but the scan must
    // still prune to (doc_id, source) — the wide text column stays unread.
    assert(!plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("text"),
      s"text column read by a 2-column sampling projection:\n$plan")
  }

  test("sequence packing plans per-shard windows — one exchange on the shard key, no global sort") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat(lit("w "), col("id")).as("text"), (col("id") % 4).cast("string").as("source"))
    val q = graft.functions.TextFunctions.packSequences(docs, budgetTokens = 64L, shardCol = "source")
    val plan = planString(q).split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one shard exchange:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"global single-partition window in the packing plan:\n$plan")
  }

  test("GlueSink partition apply: ONE exchange co-locates tables AND satisfies the dedup") {
    import graft.catalog._
    val mock = InMemoryGlueCatalog.fresh("plan-sink")
    mock.createDatabase(GDatabase("db0")); mock.createDatabase(GDatabase("db1"))
    (0 until 6).foreach(i => mock.createTable(GTable(s"t$i", s"db${i % 2}")))
    // 300 creates incl. exact duplicates (redelivery shape) across 6 tables
    val acts = (0 until 300) ++ (0 until 50)
    val actions = spark.createDataset(
      acts.map(i => GPartition(Seq(i.toString), s"db${i % 2}", s"t${i % 6}")))
      .withColumn("action", lit(Action.Create))
    val statuses = GlueSink.applyPartitions(actions, InMemoryClientFactory("plan-sink"), GlueSinkConfig())
    val df = statuses.toDF()
    val rows = df.collect() // exactly one execution — the sink is side-effecting
    // AQE's toString renders the plan twice (Final + Initial) — count
    // exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the co-locating repartition is the ONLY shuffle: the identity dedup's
    // clustering is satisfied by the (databaseName, tableName) partitioning,
    // so duplicate-collapse costs no second exchange of the partition plane
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange in the sink plan:\n$plan")
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(mock.allPartitions.size == 300) // duplicates collapsed before batching
  }

  test("nearest_centroid carries the matrix as a field: no literal blowup at dim 512 × 16, codegen'd, equals the composed form") {
    graft.plans.VectorFunctions.register(spark)
    val dim = 512; val nCents = 16
    val cents = graft.plans.VectorOps.hyperplanes(dim, nCents, seed = 7L)
    val vecs = spark.range(100).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(col("id") * (i + lit(3)), lit(97)) / 97.0 - 0.5)).cast("array<float>").as("v"))
    val q = vecs.select(col("vec_id"),
      graft.plans.VectorFunctions.nearest_centroid(col("v"), cents).as("cid"))
    val plan = planString(q)
    // 16 × 512 float literals would render a plan orders of magnitude larger
    // than this bound; the matrix-as-field form stays tiny and codegen'd.
    assert(plan.length < 10000, s"plan blew up to ${plan.length} chars — literals leaked")
    assert(plan.contains("*("), s"nearest_centroid fell out of codegen:\n$plan")
    // Bit-identical to the composed greatest(struct(cosine_f32, cid)) form it
    // replaced (same double-accumulation loop, same higher-cid tie-break).
    def litVec(a: Array[Float]) = array(a.toSeq.map(x => lit(x)): _*).cast("array<float>")
    val composed = vecs.select(col("vec_id"),
      greatest(cents.zipWithIndex.map { case (c, i) =>
        struct(graft.plans.VectorFunctions.cosine_f32(col("v"), litVec(c)).as("sim"),
          lit(i).as("cid"))
      }.toSeq: _*).getField("cid").as("cid"))
    assert(q.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted ===
      composed.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted)
    assert(q.select(countDistinct(col("cid"))).head().getLong(0) > 1)
  }

  test("pair-finder hot-key caps plan as broadcast anti-joins, never a sort-window over the exploded plane") {
    // The pair-finders pin their output (eager localCheckpoint), so the
    // returned frame's plan is just a checkpoint scan — capture the REAL
    // executed plans through a QueryExecutionListener instead.
    graft.plans.SketchFunctions.register(spark)
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = spark.range(80).select(col("id").as("doc_id"),
        concat(lit("alpha beta gamma delta epsilon token"), col("id"), lit(" omega end")).as("text"))
      graft.functions.Dedup.ngramJaccardPairs(docs, threshold = 0.3, maxDocsPerShingle = Some(50))
      graft.functions.Dedup.simhashPairs(docs, maxBucketSize = 50)
      val deadline = System.currentTimeMillis() + 10000
      def captured = plans.toArray(Array.empty[String])
      def isAnti(p: String) = p.contains("LeftAnti") && p.contains("BroadcastHashJoin")
      while (captured.count(isAnti) < 2 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      val anti = captured.filter(isAnti)
      assert(anti.length >= 2,
        s"expected both pair-finders to cap via broadcast anti-join; captured ${captured.length} plans")
      anti.foreach(p => assert(!p.contains("Window"),
        s"sort-window leaked back into a capped pair plan:\n$p"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("lsh_bands fuses all band projections into one codegen'd pass, bit-identical to per-band lsh_bucket") {
    graft.plans.VectorFunctions.register(spark)
    val dim = 64; val bands = 8; val ppb = 2; val seed = 42L
    val vecs = spark.range(150).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(col("id") * (i + lit(3)), lit(97)) / 97.0 - 0.5)).cast("array<float>").as("v"))
    val fused = vecs.select(col("vec_id"),
      graft.plans.VectorFunctions.lsh_bands(col("v"), dim, bands, ppb, seed).as("bkts"))
    val plan = planString(fused)
    // ONE lsh_bands evaluation, codegen'd, no per-band lsh_bucket projections
    assert("lsh_bands".r.findAllIn(plan).size >= 1 && !plan.contains("lsh_bucket"),
      s"per-band bucket projections leaked back:\n$plan")
    assert(plan.contains("*("), s"lsh_bands fell out of codegen:\n$plan")
    // planes are expression fields — no literal blowup at dim 64 × 16 planes
    assert(plan.length < 10000, s"plan blew up to ${plan.length} chars — literals leaked")
    // element b == lsh_bucket(v, dim, ppb, seed + b·ppb), bit for bit —
    // band b's seed block starts at seed + b·ppb so every (band, plane)
    // slot draws a UNIQUE plane (see VectorOps.bandPlanes round-11 note)
    val composed = vecs.select(col("vec_id"),
      array((0 until bands).map(b =>
        graft.plans.VectorFunctions.lsh_bucket(col("v"), dim, ppb, seed + b.toLong * ppb)): _*).as("bkts"))
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(f === c)
    assert(f.values.flatten.toSet.size > 1)
  }

  test("banded proximity join equals the naive theta-join and plans as an equi-join") {
    // Dense synthetic stream with pairs straddling bucket boundaries: user u
    // fires every 7s, so 60s-gap pairs regularly cross floor(us/gap) edges.
    val events = spark.range(400).select(
      (col("id") % 5).cast("string").as("user_id"),
      col("id").as("event_id"),
      (col("id") * 7000000L + (col("id") % 3) * 999999L).as("us"))
    val gap = 60000000L
    val banded = graft.functions.EventOps.proximityPairs(events, gap)
    val naive = {
      val a = events.select(col("user_id"), col("event_id").as("id_a"), col("us").as("us_a"))
      val b = events.select(col("user_id").as("u2"), col("event_id").as("id_b"), col("us").as("us_b"))
      a.join(b, col("user_id") === col("u2") &&
          col("us_b") - col("us_a") > 0 && col("us_b") - col("us_a") <= gap)
        .select(col("user_id"), col("id_a"), col("id_b"), (col("us_b") - col("us_a")).as("gap_us"))
    }
    val bs = banded.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val ns = naive.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(bs === ns, s"banded join diverged from the naive theta-join")
    assert(bs.nonEmpty)
    // every true pair found EXACTLY once (set equality + count equality)
    assert(banded.count() === bs.size.toLong)
    // the scale property: an equality join on (user, bucket), never a
    // per-user product (BroadcastNestedLoop/Cartesian)
    val plan = planString(banded)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"proximity join fell back to a product plan:\n$plan")

    // Flood cap: a bot user firing 50 events into ONE gap window drops
    // wholesale at cap 20; everyone else's pairs are untouched.
    val bot = spark.range(50).select(lit("bot").as("user_id"),
      (col("id") + 10000L).as("event_id"), (col("id") * 1000L).as("us"))
    val flooded = events.unionByName(bot)
    val capped = graft.functions.EventOps.proximityPairs(flooded, gap,
      maxEventsPerBucket = Some(20))
    val cs = capped.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(cs === ns, "cap dropped more than the flooded cell")
    assert(graft.functions.EventOps.proximityPairs(flooded, gap, maxEventsPerBucket = None)
      .where(col("user_id") === "bot").count() === 50L * 49 / 2)
  }

  test("windowed as-of join equals the range-join + argmax form, in one window pass") {
    // Collision-rich stream: equal timestamps across sides and within the
    // left side, users with zero views, interleaved ordering.
    val ev = spark.range(300).select(
      (col("id") % 7).cast("string").as("user_id"),
      col("id").as("event_id"),
      ((col("id") * 13) % 40 * 1000000L).as("us"),   // heavy us collisions
      when(col("id") % 3 === 0, "purchase").otherwise("view").as("event_type"))
      .where(col("user_id") =!= "6" || col("event_type") === "purchase") // user 6: no views
    val v = ev.where(col("event_type") === "view")
    val p = ev.where(col("event_type") === "purchase")
    val windowed = graft.functions.EventOps.asofJoin(v, p)
      .select(col("event_id"), col("asof_id"))
    val pp = p.select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("us").as("p_us"))
    val vv = v.select(col("user_id").as("v_user"), col("us").as("v_us"), col("event_id").as("v_id"))
    // range predicate INSIDE the left join: a purchase whose views are all
    // LATER must survive with a null match, not vanish in a post-filter
    val naive = pp.join(vv, col("p_user") === col("v_user") && col("v_us") <= col("p_us"), "left_outer")
      .groupBy(col("p_id"))
      .agg(max(struct(col("v_us"), col("v_id"))).as("m"))
      .select(col("p_id").as("event_id"), col("m.v_id").as("asof_id"))
    val ws = windowed.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val ns = naive.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(ws === ns)
    assert(ws.values.exists(_.isEmpty), "expected at least one no-prior-view purchase")
    // one exchange (user), no join operator at all in the windowed plan
    val plan = planString(windowed).split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, s"expected one exchange:\n$plan")
    assert(!plan.contains("Join"), s"windowed as-of still plans a join:\n$plan")
    // misuse fails at PLANNING: a string id would silently null out under an
    // asymmetric long cast — the guard rejects it up front (round-5 ADVICE)
    val e = intercept[IllegalArgumentException] {
      graft.functions.EventOps.asofJoin(
        v.withColumn("event_id", col("event_id").cast("string")), p)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("brute-force top-k plans as TakeOrderedAndProject (partial per-partition top-k)") {
    graft.plans.VectorFunctions.register(spark)
    val vecs = (0 until 200).map(i => (i.toLong, Seq.fill(8)(i.toFloat / 200)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = graft.functions.Similarity.bruteForceTopK(vecs, Seq.fill(8)(0.5f), k = 5)
    val plan = planString(q)
    assert(plan.contains("TakeOrderedAndProject"),
      s"global sort instead of partial top-k:\n$plan")
  }

  test("incremental dedup anti-join broadcasts the small hash plane and never joins payloads") {
    val known = graft.functions.Dedup.withContentHash(
      (0 until 50).map(i => (i.toLong, s"known doc $i")).toDF("doc_id", "text"))
      .select("content_hash")
    val batch = (0 until 5000).map(i => (1000L + i, s"new doc $i")).toDF("doc_id", "text")
    val q = graft.functions.Dedup.dedupAgainstKnown(batch, known)
    val plan = planString(q)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"known plane not broadcast / not anti:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected shuffle join:\n$plan")
    assert(q.count() === 5000)
  }

  test("semantic dedup survivor anti-join broadcasts the pair plane, never shuffles the vectors") {
    import spark.implicits._
    // 2000 vectors, 100 planted exact duplicates: the pair plane the anti-
    // join consumes is tiny (one row per duplicate) while the vector plane
    // is the big side — the 100 TB shape where survivors = vectors minus a
    // broadcast-able removal set.
    val base = spark.range(2000).map { i =>
      // hash-mixed SIGNED components: distinct ids give genuinely spread
      // directions (an all-positive structured generator puts every vector
      // in one cone and "everything dedups against everything")
      (i, Array.tabulate(16)(d => (((i * 73856093L) ^ (d * 19349663L)) % 1001 - 500) / 500.0f))
    }.toDF("vec_id", "embedding")
    val planted = base.where($"vec_id" % 20 === 0)
      .select(($"vec_id" + 10000000L).as("vec_id"), $"embedding")
    val survivors = graft.functions.Similarity.semanticDedup(
      base.unionByName(planted), threshold = 0.999, dim = 16)
    assert(survivors.count() === 2000) // every planted copy removed
    val plan = planString(survivors)
    assert(plan.contains("LeftAnti"), s"no anti-join in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"pair plane not broadcast — the big vector side would shuffle:\n$plan")
  }

  test("segmentDedup winners aggregate with map-side combine — no Window over the segment plane") {
    val docs = (0 until 200).map(i => (i.toLong,
      (1 to 25).map(j => s"t${(i * 31 + j) % 40}").mkString(" "))).toDF("doc_id", "text")
    val out = graft.functions.Dedup.segmentDedup(docs)
    val plan = planString(out)
    // hot boilerplate keys must fold in partial aggregation, not funnel
    // through a single row_number partition
    assert(!plan.contains("Window"), s"winner selection regressed to a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"), s"no aggregate for winner min:\n$plan")
  }

  test("cms_md5 sketches aggregate map-side (ObjectHashAggregate partials, bounded exchange)") {
    graft.plans.SketchFunctions.register(spark)
    val tok = (0 until 500).map(i => (s"src${i % 4}", s"tok${i % 23}")).toDF("source", "token")
    val out = tok.groupBy("source")
      .agg(graft.plans.SketchFunctions.cms_md5(col("token"), 4, 16).as("sketch"))
    val plan = planString(out)
    // the whole point of the sketch: the exchange carries d*w longs per
    // (partition, group), so the aggregate MUST split partial/final around
    // the shuffle instead of shipping the token stream to its group
    assert(plan.contains("ObjectHashAggregate"), s"no object-hash aggregate:\n$plan")
    assert(plan.contains("partial_cms_md5") || plan.contains("partial cms_md5")
      || plan.split("ObjectHashAggregate").length > 2,
      s"cms_md5 did not plan map-side partials:\n$plan")
  }

  test("boilerplateScrub doc-frequency folds in aggregates — no Window over the segment plane") {
    val docs = (0 until 200).map(i => (i.toLong,
      (1 to 25).map(j => s"t${(i * 31 + j) % 40}").mkString(" "))).toDF("doc_id", "text")
    val out = graft.functions.Dedup.boilerplateScrub(docs)
    val plan = planString(out)
    assert(!plan.contains("Window"), s"df counting regressed to a window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"), s"no aggregate for doc frequency:\n$plan")
  }

  test("heavyHitterTokens recount gates through a broadcast semi-join, never a shuffled one") {
    val docs = (0 until 100).map(i => (i.toLong,
      (1 to 20).map(j => s"w${(i + j) % 30}").mkString(" "))).toDF("doc_id", "text")
    val out = graft.functions.TextFunctions.heavyHitterTokens(docs, m = 5, k = 64)
    val plan = planString(out)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"candidate gate should be a broadcast semi-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-m should be TakeOrdered, not a global sort:\n$plan")
  }

  test("quantizedTopK is one scan into TakeOrdered — no shuffle, no join") {
    val vecs = (0 until 500).map(i => (i.toLong,
      Array.tabulate(16)(d => ((i * 7 + d * 13) % 100) / 100.0f))).toDF("vec_id", "embedding")
    val q = Array.tabulate(16)(d => (d % 10) / 10.0f).toSeq
    val out = graft.functions.Similarity.quantizedTopK(vecs, q, k = 10)
    val plan = planString(out)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should be TakeOrdered (partial per partition + merge):\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange hashpartitioning"),
      s"int8 scan should not shuffle:\n$plan")
  }

  test("Naive Bayes classify broadcasts the model — the corpus never shuffles against it") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma doc "), col("id") % 7).as("text"),
      (col("id") % 3).cast("string").as("lang"))
    val (model, stats) = graft.functions.TextFunctions.naiveBayesTrain(
      docs.where(col("doc_id") % 5 === 0), "lang")
    val scored = graft.functions.TextFunctions.naiveBayesClassify(docs, model, stats)
    // AQE's toString keeps the pre-adaptive plan under "== Initial Plan ==";
    // audit the FINAL section only
    val plan = planString(scored).split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"model/stats not broadcast into the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled against the vocab-bounded model:\n$plan")
    // every (doc, label) pair scored — left-outer keeps zero-match labels
    assert(scored.count() === 300L * 3)
  }

  test("q21 plans EXISTS as ONE semi join and NOT-EXISTS as ONE anti join — no product plan") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q21_waiting_supplier")(spark, dir)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the supplier-inequality rides as a residual condition INSIDE the
    // orderkey hash joins — a planner regression to nested-loop/cartesian
    // would be the 100 TB killer here
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"q21 fell back to a product plan:\n$plan")
    assert("LeftSemi".r.findAllIn(plan).size >= 2, // F-order gate + other-supplier EXISTS
      s"q21 EXISTS not planned as semi joins:\n$plan")
    assert("LeftAnti".r.findAllIn(plan).size == 1,
      s"q21 NOT-EXISTS not planned as exactly one anti join:\n$plan")
    // three column-pruned lineitem passes (l1/l2/l3) and not one more: each
    // scans only (orderkey, suppkey[, returnflag]) — assert the scan count
    // so a refactor that re-scans per subquery fails loudly
    assert("Scan parquet".r.findAllIn(plan).size <= 6, s"unexpected extra scans:\n$plan")
  }

  test("every adapted TPC-H row plans without a CartesianProduct") {
    // blanket regression guard over the full 22-shape suite (+ twins): a
    // refactor that breaks an equi-join condition silently degrades to a
    // product plan — the canonical 100 TB killer. (One-row scalar frames
    // legitimately cross-broadcast as BroadcastNestedLoopJoin; an unbounded
    // CartesianProduct is never legitimate here.)
    val dir = "/root/testdata/sf0.001"
    val tpch = SparkEntry.queries.keys.filter(_.startsWith("q")).toList.sorted
    assert(tpch.size >= 24, s"expected the full suite, found $tpch")
    tpch.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name degraded to a cartesian product:\n$plan")
    }
  }

  test("q13 aggregates orders BEFORE the outer join and never shuffles the customer side") {
    val dir = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q13_order_distribution")(spark, dir)
    assert(df.collect().nonEmpty)
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the outer join consumes the per-customer COUNT frame (one row per
    // active customer) broadcast against the customer scan — a hot customer
    // costs one row, and customer itself never exchanges
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"),
      s"q13 outer join not broadcast:\n$plan")
    // exactly the aggregation exchanges (orders pre-agg + final distribution
    // + ordering), none attributable to the customer scan branch: the
    // customer subtree must flow scan→join with no exchange between
    val custBranch = plan.linesIterator.toList
      .dropWhile(l => !l.contains("Scan parquet") || !l.contains("customer"))
    assert(custBranch.nonEmpty, s"no customer scan found:\n$plan")
    val joinLine = plan.linesIterator.toList.filter(_.contains("BroadcastHashJoin"))
    assert(joinLine.nonEmpty)
    assert(!plan.contains("SortMergeJoin"),
      s"q13 outer join regressed to a shuffled join:\n$plan")
  }

  test("bucketed co-located join merges with zero exchange and zero sort") {
    val base = java.nio.file.Files.createTempDirectory("graft-plan-bkt")
    // repartition on the bucket key first: one file per bucket is the
    // precondition for Spark to trust the written sort order and elide the
    // merge-join Sort (multi-file buckets only guarantee per-file order)
    spark.range(2000).select(col("id").as("k"), (col("id") % 5).as("pri"))
      .repartition(4, col("k"))
      .write.mode("overwrite").option("path", base.resolve("a").toString)
      .bucketBy(4, "k").sortBy("k").saveAsTable("plan_bkt_a")
    spark.range(6000).select((col("id") % 2000).as("k"), (col("id") * 3).as("v"))
      .repartition(4, col("k"))
      .write.mode("overwrite").option("path", base.resolve("b").toString)
      .bucketBy(4, "k").sortBy("k").saveAsTable("plan_bkt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // trusting the written per-bucket sort needs the explicit opt-in since
    // Spark 3 (sound only with one file per bucket — guaranteed above)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = spark.table("plan_bkt_a")
        .join(spark.table("plan_bkt_b"), "k")
      val plan = planString(joined)
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not exchange either side:\n$plan")
      // sortBy at write time: the merge reads pre-sorted buckets, no Sort node
      assert(!plan.contains("Sort "), s"bucketed join should skip sorting:\n$plan")
      assert(joined.count() == 6000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  // ---- table-driven broadcast audit over the full adapted TPC-H suite ----
  //
  // Dimension sides must arrive at their joins as broadcasts: a Spark
  // upgrade (changed stats, changed AQE thresholds, changed join reorder)
  // that silently ships a dimension through a shuffle turns a map-side join
  // into an exchange over the FACT side at 100 TB. The walk flags any
  // SortMergeJoin / ShuffledHashJoin whose one input is purely a
  // (filtered/projected) scan of an always-small-relative-to-fact table —
  // region, nation, supplier, part. A dim subtree containing its own
  // aggregation or join is exempt (it is a derived frame, judged by its own
  // stats), and customer is exempt (fact-sized at scale: q13/q18 shapes
  // legitimately shuffle it).
  private val broadcastDims = Set("region", "nation", "supplier", "part")

  /** Unwrap AQE/stage/codegen wrappers to the real operator children. */
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      Seq(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
    case other => other.children
  }

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    p +: kids(p).flatMap(collectAll)

  private def scannedTables(p: SparkPlan): Set[String] =
    collectAll(p).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        "(region|nation|customer|supplier|part|orders|lineitem|events|documents|embeddings)\\.parquet".r
          .findFirstMatchIn(s.relation.location.rootPaths.mkString(","))
          .map(_.group(1)).toSeq
    }.flatten.toSet

  /** True when the subtree is nothing but scan→filter→project plumbing
    * (incl. the exchange/sort a merge join inserts) — i.e. a raw table side
    * whose size Spark could have known statically. */
  private def pureScanBranch(p: SparkPlan): Boolean = collectAll(p).forall {
    case _: org.apache.spark.sql.execution.FileSourceScanExec => true
    case _: org.apache.spark.sql.execution.FilterExec => true
    case _: org.apache.spark.sql.execution.ProjectExec => true
    case _: org.apache.spark.sql.execution.SortExec => true
    case _: org.apache.spark.sql.execution.ColumnarToRowExec => true
    case _: org.apache.spark.sql.execution.InputAdapter => true
    case _: org.apache.spark.sql.execution.WholeStageCodegenExec => true
    case _: org.apache.spark.sql.execution.CoalesceExec => true
    case _: org.apache.spark.sql.execution.adaptive.QueryStageExec => true
    case _: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec => true
    case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => true
    case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => true
    case _ => false
  }

  test("every adapted TPC-H row ships its dimension sides as broadcasts, never through a shuffle") {
    val dir = "/root/testdata/sf0.001"
    val tpch = SparkEntry.queries.keys.filter(_.startsWith("q")).toList.sorted
    assert(tpch.size >= 24, s"expected the full suite, found $tpch")
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    tpch.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect() // finalize AQE
      val shuffledJoins = collectAll(df.queryExecution.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      shuffledJoins.foreach { j =>
        j.children.foreach { side =>
          val tables = scannedTables(side)
          if (tables.nonEmpty && tables.subsetOf(broadcastDims) && pureScanBranch(side))
            offenders += s"$name: ${tables.mkString("+")} side of ${j.nodeName} shuffled"
        }
      }
    }
    assert(offenders.isEmpty, s"dimension sides shuffled:\n${offenders.mkString("\n")}")

    // Negative self-check: the walk must actually CATCH a shuffled dim —
    // force one and assert detection, so the guard can never pass vacuously.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bad = spark.read.parquet(s"$dir/orders.parquet")
        .join(spark.read.parquet(s"$dir/nation.parquet"),
          col("o_custkey") % 25 === col("n_nationkey"))
      bad.collect()
      val caught = collectAll(bad.queryExecution.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }.flatMap(_.children).exists(side =>
        scannedTables(side) == Set("nation") && pureScanBranch(side))
      assert(caught, "the dim-shuffle detector failed to flag a forced nation shuffle")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
