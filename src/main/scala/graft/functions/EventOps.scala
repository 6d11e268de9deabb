package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream join shapes beyond the windowed aggregations (SURVEY §2.5's
 * as-of / sessionize / tumbling / sliding family).
 *
 * The proximity join is the banded (bucketized) interval self-join: the
 * naive formulation — `a JOIN b ON a.user = b.user AND b.ts - a.ts BETWEEN
 * 1 AND gap` — plans as an equality join on user followed by a per-user
 * product filter, which goes quadratic in each user's event count. Banding
 * on `floor(ts / gap)` makes the join key (user, bucket): any pair within
 * `gap` lands in the same or adjacent bucket, so the LEFT side duplicates
 * into its own and the NEXT bucket (factor-2 row inflation, not quadratic)
 * and every true pair is found exactly once — the right side's bucket is
 * single-valued, so at most one of the two left copies can match it (no
 * dedup pass needed). One hash exchange per side; per-key work is bounded
 * by events-per-user-per-gap-window, the physically meaningful density.
 */
object EventOps {

  /**
   * Schema-on-read normalization for event timestamps: append a canonical
   * epoch-MICROS bigint column (`ts_us`) regardless of how the upstream
   * writer chose to encode the instant in parquet. The reference treats
   * schemas as tolerated payload rather than pinned physical types (Hive
   * type strings carried as data, sample_table_schema.json:21-29); the same
   * discipline applies to our own inputs — an upstream writer switching
   * parquet timestamp units (int64-nanos → TIMESTAMP(MICROS), adjusted-to-
   * UTC vs NTZ) must be a no-op for every consumer, which is exactly what
   * broke 10 queries in round 8 when the fixtures regenerated.
   *
   * Handled representations:
   *  - `bigint`: int64 nanoseconds (the nanosAsLong read of TIMESTAMP(NANOS)
   *    parquet, which Spark cannot represent natively) → integer-div 1000;
   *  - `timestamp`: instant-typed (isAdjustedToUTC=true) → `unix_micros`;
   *  - `timestamp_ntz`: wall-clock-typed (isAdjustedToUTC=false) → cast to
   *    instant under the session time zone, then `unix_micros`. Callers run
   *    UTC sessions (Verify/tests/t() all pin it), so the wall-clock value
   *    IS the stored micros value and the three encodings agree exactly.
   *
   * Works on batch and streaming frames alike (pure column expressions).
   */
  def withTsUs(df: DataFrame, tsCol: String = "ts", out: String = "ts_us"): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val us = df.schema(tsCol).dataType match {
      case LongType         => expr(s"`$tsCol` div 1000")
      case TimestampType    => unix_micros(col(tsCol))
      case TimestampNTZType => unix_micros(col(tsCol).cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"unsupported event-time type for `$tsCol`: ${other.simpleString} " +
          "(expected bigint nanos, timestamp, or timestamp_ntz)")
    }
    df.withColumn(out, us.cast("bigint"))
  }

  /** Pairs of events of the same user strictly within `gapUs` microseconds
    * (0 < us_b − us_a ≤ gapUs), with the gap. `usCol` is an epoch-micros
    * bigint column.
    *
    * `maxEventsPerBucket` is the flood cap (the same skew discipline as the
    * dedup pair-finders' `maxBucketSize`): a degenerate key — one user
    * emitting e.g. a million events inside one gap window, bots/replays —
    * would cost O(n²) pairs in that (user, bucket) cell, which is quadratic
    * work AND quadratic output nobody can consume. Events whose HOME cell
    * exceeds the cap drop wholesale before banding (capping join rows
    * per-cell instead would leak their adjacent-bucket copies into the
    * neighbor's join) — at 10k a flooded cell means ≥ ~50M pairs from one
    * user in one window, noise by construction. The LIBRARY default is None
    * — the generic API must not silently diverge from its documented pair
    * semantics (round-5 ADVICE); production queries opt in explicitly (the
    * shipped bench query passes Some(10000), and its oracle equality proves
    * the cap never fires on that corpus; the flood spec plants a hot cell to
    * show only it drops). */
  def proximityPairs(
      events: DataFrame,
      gapUs: Long,
      userCol: String = "user_id",
      idCol: String = "event_id",
      usCol: String = "us",
      maxEventsPerBucket: Option[Int] = None): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val all = events.select(
      col(userCol).as("_user"), col(idCol).as("_id"), col(usCol).cast("bigint").as("_us"),
      floor(col(usCol).cast("bigint") / gapUs).as("_home"))
    // Drop the flooded EVENTS (by home cell) before banding — capping join
    // rows per cell instead would leak the hot events' adjacent-bucket
    // copies into the neighboring cell's join.
    val e = maxEventsPerBucket match {
      case None => all
      case Some(cap) =>
        val hot = all.groupBy("_user", "_home").count()
          .where(col("count") > cap).select("_user", "_home")
        all.join(broadcast(hot), Seq("_user", "_home"), "left_anti")
    }
    val a = e.select(col("_user"), col("_id").as("id_a"), col("_us").as("us_a"),
      explode(array(col("_home"), col("_home") + 1)).as("_bucket"))
    val b = e.select(col("_user"), col("_id").as("id_b"), col("_us").as("us_b"),
      col("_home").as("_bucket"))
    a.join(b, Seq("_user", "_bucket"))
      .where(col("us_b") - col("us_a") > 0 && col("us_b") - col("us_a") <= gapUs)
      .select(col("_user").as(userCol), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
  }

  /**
   * As-of join as ONE window pass: each `right` row (purchase) matched to the
   * latest `left` row (view) at-or-before it per user.
   *
   * The range-join + argmax formulation (`p JOIN v ON user AND v_us <= p_us`
   * then max per purchase) re-scans EVERY prior view per purchase — per-user
   * quadratic, the theta-join disease. Here both sides union into one
   * ordered stream per user and a running `last(view_id, ignoreNulls)` over
   * (us ASC, isRight ASC, id ASC) carries the answer to each right row:
   * one shuffle on user, one sort, linear work. Ordering places same-
   * microsecond views BEFORE the purchase (at-or-before includes ties) and
   * higher view ids later (running last = the id tie-break the argmax used).
   * Right rows with no prior left keep a null match.
   */
  def asofJoin(
      left: DataFrame,   // (userCol, idCol, usCol) — the quotes/views side
      right: DataFrame,  // (userCol, idCol, usCol) — the probes/purchases side
      userCol: String = "user_id",
      idCol: String = "event_id",
      usCol: String = "us"): DataFrame = {
    // Ids must be integral on BOTH sides, checked up front: a silent
    // string→long cast would null the ids (corrupt output, not a failure) and
    // an asymmetric cast would diverge the two sides' types (round-5 ADVICE —
    // misuse fails at planning, never by producing null ids).
    Seq("left" -> left, "right" -> right).foreach { case (side, df) =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = df.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"asofJoin requires an integral $idCol; $side side has ${dt.simpleString}")
    }
    val l = left.select(col(userCol).as("_user"), col(usCol).cast("bigint").as("_us"),
      col(idCol).cast("long").as("_lid"), lit(null).cast("long").as("_rid"), lit(0).as("_isRight"))
    val r = right.select(col(userCol).as("_user"), col(usCol).cast("bigint").as("_us"),
      lit(null).cast("long").as("_lid"), col(idCol).cast("long").as("_rid"), lit(1).as("_isRight"))
    val w = Window.partitionBy(col("_user"))
      .orderBy(col("_us").asc, col("_isRight").asc, coalesce(col("_lid"), col("_rid")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_asof", last(col("_lid"), ignoreNulls = true).over(w))
      .where(col("_isRight") === 1)
      .select(col("_user").as(userCol), col("_rid").as(idCol),
        col("_us").as(usCol), col("_asof").as("asof_id"))
  }
}
