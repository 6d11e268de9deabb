package graft.run

import org.apache.spark.sql.SparkSession

/** UNTIMED inter-query hygiene shared by Bench and Sf1Smoke (r16 measurement
  * fix, guide §1; extracted r17 so the two copies cannot drift): a
  * multi-query suite shares one JVM, and row N's cost used to depend on the
  * garbage rows 1..N−1 left behind — measured at sf0.1: m_meta_extract
  * 2.26 s mid-suite vs 0.23 s isolated (10 rows flagged ref_inflated on a
  * QUIET box). Two mechanisms: (a) dead localCheckpoint / broadcast blocks
  * pile up in the unified memory pool because the ContextCleaner only
  * reclaims them after a driver GC, and a 32 GiB-max heap almost never runs
  * one — eviction churn + GC pressure then bill to whoever runs next;
  * (b) every drained streaming query leaves its state store providers
  * loaded (maintenance unload lags by up to the 60 s maintenance interval),
  * so post-streaming rows run against a background thread pool. Unloading
  * providers and forcing one GC BETWEEN queries (never inside a timed
  * region) makes row N measure row N again. Fixture planes stay strongly
  * referenced by the session memo, and StateStore restarts lazily.
  *
  * The GC is PRESSURE-GATED, not unconditional: a first cut ran System.gc()
  * after all 244 queries and the ~20–30 parallel GC threads it bursts
  * inflated the 1-min loadavg the late-suite single-repeat rows run under
  * (s7_activity_tws 4.3→11.1 s). Collecting only when the block manager
  * actually holds >1 GiB keeps the reclaim where it pays and the load flat
  * elsewhere.
  *
  * Catches NonFatal only (ADVICE r16): an OutOfMemoryError or interrupt
  * during hygiene means the JVM is dying — masking it would let the suite
  * keep emitting rows measured in a broken state. */
object BenchHygiene {
  def interQueryCleanup(spark: SparkSession): Unit = {
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case scala.util.control.NonFatal(_) => () }
    val storageUsed = try {
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, remaining) => max - remaining }.sum
    } catch { case scala.util.control.NonFatal(_) => 0L }
    if (storageUsed > (1L << 30)) System.gc()
  }
}
