package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale smoke for the custom as-of join exec vs the window composition.
 *
 * The oracle fixture (10k events) verifies semantics; this main asks the
 * 100× question: 4M probe rows ⟕asof 4M reference rows over 100k keys.
 * Both implementations compute the identical answer (checksummed); the
 * interesting numbers are the shapes —
 *
 *  - AsOfJoinExec: one exchange + one sort per side, then an O(1)-state
 *    streaming merge. 8M rows total cross the shuffle.
 *  - EventOps.asofJoin (union + running last() window): unions BOTH sides
 *    into one 8M-row stream, windows it (sort + window buffer), then
 *    filters half the rows back out — same answer, strictly more machine.
 *
 * At 1000 executors the delta compounds: the window path's union stream is
 * 2× the exec's probe-side rows AND every window partition buffers, while
 * the merge exec streams with constant state.
 *
 * Run: `sbt "runMain graft.run.AsOfScaleSmoke"` (env
 * SPARK_GRAFT_SMOKE_EVENTS overrides the per-side row count).
 */
object AsOfScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SMOKE_EVENTS", "4000000").toLong
    val keys = 100000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[asof-smoke] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // deterministic synthetic planes: splitmix-spread times per key
    def plane(seed: Long): DataFrame = spark.range(n)
      .select(col("id").as("event_id"),
        pmod(hash(col("id") + lit(seed)), lit(keys)).cast("long").as("user_id"),
        pmod(hash(col("id") * 31 + lit(seed)), lit(1000000000L)).cast("long").as("us"))
    val probes = timed("materialize probes")(plane(1L).localCheckpoint(true))
    val refs = timed("materialize refs")(plane(2L).localCheckpoint(true))

    // checksum folds BOTH the match id and the reference payload (its us):
    // proves the exec's carried payload equals what the window path must
    // fetch with an extra join
    def ck(df: DataFrame, idCol: String, payloadCol: String) =
      df.agg(count(col(idCol)).as("matched"),
        (sum(coalesce(col(idCol), lit(0L))) +
         sum(coalesce(col(payloadCol), lit(0L)))).as("ck")).collect()(0)

    // (1) the custom exec: full reference payload rides the merge for free
    val exec = timed("custom merge exec") {
      ck(graft.plans.AsOfJoin.asofJoin(probes, refs, Seq("user_id"), "us", "us",
        tieBreakCols = Seq("event_id")), "event_id_r", "us_r")
    }
    // (2) the window composition carries ONE id; the production enrichment
    // shape (full reference row) needs a join back — a whole extra shuffle
    // of the reference plane
    val window = timed("window + payload join") {
      val ids = graft.functions.EventOps.asofJoin(
        refs.select(col("user_id"), col("event_id"), col("us")),
        probes.select(col("user_id"), col("event_id"), col("us")))
      val enriched = ids.join(
        refs.select(col("event_id").as("asof_id"), col("us").as("ref_us")),
        Seq("asof_id"), "left")
      ck(enriched, "asof_id", "ref_us")
    }
    // (3) id-only window drain, for the floor without enrichment
    val windowIdOnly = timed("window id-only") {
      graft.functions.EventOps.asofJoin(
          refs.select(col("user_id"), col("event_id"), col("us")),
          probes.select(col("user_id"), col("event_id"), col("us")))
        .agg(count(col("asof_id")).as("matched"),
          sum(coalesce(col("asof_id"), lit(0L))).as("ck")).collect()(0)
    }
    println(s"[asof-smoke] exec    matched=${exec.getLong(0)} ck=${exec.getLong(1)}")
    println(s"[asof-smoke] window  matched=${window.getLong(0)} ck=${window.getLong(1)}")
    println(s"[asof-smoke] id-only matched=${windowIdOnly.getLong(0)}")
    require(exec.getLong(0) == window.getLong(0) && exec.getLong(1) == window.getLong(1),
      "exec and window composition disagree")
    println("[asof-smoke] identical answers incl. payload; OK")
    spark.stop()
  }
}
