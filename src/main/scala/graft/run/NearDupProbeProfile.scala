package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler (r17, not part of the suite): phase timings for the
  * X46 near-dup index PROBE as consumed by d_incr_neardup vs
  * d_incr_neardup_gen2 — the r16 verdict flagged gen2 at ~2× its r15 cost
  * after the O(candidate-docs) verify landed, with no committed breakdown
  * of where the probe invocation spends. Phases mirror
  * Dedup.probeNearDupIndex's internals: batch signatures → band join →
  * sig gate → member expansion (cands checkpoint) → candidate-doc gram
  * verify (result checkpoint). Run after `sbt compile`:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.run.NearDupProbeProfile"
  */
object NearDupProbeProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.SketchFunctions.register(spark)
    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      System.err.println(f"[ndprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")

    val base = t("documents").where(col("n_chars") < 300)
      .select(col("doc_id"), col("text"))

    // ---- d_incr_neardup shape ----
    val idx1 = java.nio.file.Files.createTempDirectory("ndp-idx1").toString
    timed("incr: build index") {
      graft.functions.Dedup.writeNearDupIndex(base, idx1, k = 64, bands = 32)
    }
    val batchNear = base.where(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 30000000L).as("doc_id"),
        concat(col("text"), lit(" graftincrdup")).as("text"))
    val batchFresh = base.where(col("doc_id") % 9 === 1)
      .select((col("doc_id") + 40000000L).as("doc_id"),
        concat_ws(" ",
          concat(lit("zqa"), (col("doc_id") + 40000000L).cast("string")),
          concat(lit("zqb"), (col("doc_id") + 40000000L).cast("string")),
          concat(lit("zqc"), (col("doc_id") + 40000000L).cast("string")),
          concat(lit("zqd"), (col("doc_id") + 40000000L).cast("string"))).as("text"))
    (1 to 3).foreach { i =>
      timed(s"incr: probe run $i") {
        graft.functions.Dedup.probeNearDupIndex(
          batchNear.unionByName(batchFresh), idx1, base,
          k = 64, bands = 32, candidateThreshold = 0.2, verifyThreshold = 0.8)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- d_incr_neardup_gen2 shape ----
    def zrText(idc: org.apache.spark.sql.Column) = concat_ws(" ",
      Seq("zra", "zrb", "zrc", "zrd", "zre", "zrf", "zrg", "zrh")
        .map(p => concat(lit(p), idc.cast("string"))): _*)
    val gen1 = base.where(col("doc_id") % 9 === 1)
      .select((col("doc_id") + 45000000L).as("doc_id"),
        zrText(col("doc_id") + 45000000L).as("text"))
    val idx2 = java.nio.file.Files.createTempDirectory("ndp-idx2").toString
    timed("gen2: build index") {
      graft.functions.Dedup.writeNearDupIndex(base, idx2, k = 64, bands = 32)
    }
    timed("gen2: append gen1") {
      graft.functions.Dedup.appendNearDupIndex(gen1, idx2, k = 64, bands = 32)
    }
    val gen2FromGen1 = gen1
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" zrx")).as("text"))
    val gen2FromBase = base.where(col("doc_id") % 9 === 2)
      .select((col("doc_id") + 60000000L).as("doc_id"),
        concat(col("text"), lit(" graftgen2dup")).as("text"))
    val newDocs2 = gen2FromGen1.unionByName(gen2FromBase)
    val baseDocs2 = base.unionByName(gen1)
    (1 to 3).foreach { i =>
      timed(s"gen2: probe run $i") {
        graft.functions.Dedup.probeNearDupIndex(newDocs2, idx2, baseDocs2,
          k = 64, bands = 32, candidateThreshold = 0.2, verifyThreshold = 0.8)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ---- phase breakdown of the gen2 probe (inline copy of the internals) ----
    {
      import graft.plans.{SketchFunctions => SF}
      import org.apache.spark.storage.StorageLevel
      val k = 64; val bands = 32; val shingleN = 3
      val candidateThreshold = 0.2; val verifyThreshold = 0.8
      val idxBands = spark.read.parquet(s"$idx2/bands")
        .select(col("band"), col("bucket"), col("id").as("_rb"))
      val idxSigs = spark.read.parquet(s"$idx2/sigs")
        .select(col("id").as("_rb"), col("sig").as("sig_b"))
      val idxMembers = spark.read.parquet(s"$idx2/members")
        .select(col("id").as("id_base"), col("rep").as("_rb"))
      (1 to 2).foreach { run =>
        val newSigned = graft.functions.Dedup.signatures(newDocs2, "doc_id", "text", k, shingleN)
          .persist(StorageLevel.MEMORY_AND_DISK)
        timed(s"gen2 phase run $run: signatures (count)") { newSigned.count() }
        val (newMembers, newReps) = graft.functions.Dedup.sigGroups(newSigned)
        val newBanded = newReps.select(col("id").as("_ra"),
          posexplode(SF.minhash_bands(col("sig"), bands)).as(Seq("band", "bucket")))
        val repCands0 = newBanded.join(idxBands, Seq("band", "bucket"))
          .select(col("_ra"), col("_rb")).dropDuplicates("_ra", "_rb")
        val repCands = repCands0
          .join(newSigned.select(col("id").as("_ra"), col("sig").as("sig_a")), Seq("_ra"))
          .join(idxSigs, Seq("_rb"))
          .where(SF.sig_agreement(col("sig_a"), col("sig_b")) >= candidateThreshold)
          .select("_ra", "_rb")
        val cands = repCands
          .join(newMembers.select(col("rep").as("_ra"), col("id").as("id_new")), Seq("_ra"))
          .join(idxMembers, Seq("_rb"))
          .select(col("id_new"), col("id_base"))
          .dropDuplicates("id_new", "id_base")
        val candsM = timed(s"gen2 phase run $run: cands checkpoint") {
          cands.localCheckpoint(true)
        }
        System.err.println(s"[ndprobe] gen2 n_cands=${candsM.count()}")
        def gramsFor(df: DataFrame, out: String): DataFrame = df
          .join(candsM.select(col(out).as("doc_id")).distinct(), Seq("doc_id"), "left_semi")
          .select(col("doc_id").as(out),
            array_distinct(graft.functions.TextFunctions.wordNgrams(col("text"), shingleN))
              .as(s"g_$out"))
          .withColumn(s"n_$out", size(col(s"g_$out")))
        timed(s"gen2 phase run $run: verify join + checkpoint") {
          candsM
            .join(gramsFor(newDocs2, "id_new"), Seq("id_new"))
            .join(gramsFor(baseDocs2, "id_base"), Seq("id_base"))
            .withColumn("inter", size(array_intersect(col("g_id_new"), col("g_id_base"))))
            .withColumn("jaccard",
              col("inter") / (col("n_id_new") + col("n_id_base") - col("inter")))
            .where(coalesce(col("jaccard"), lit(0.0)) >= verifyThreshold)
            .select(col("id_new"), col("id_base"), round(col("jaccard"), 6).as("jaccard"))
            .localCheckpoint(true)
        }
        newSigned.unpersist()
      }
    }
    spark.stop()
  }
}
