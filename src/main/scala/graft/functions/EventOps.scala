package graft.functions

import org.apache.spark.sql.DataFrame
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

  /** Pairs of events of the same user strictly within `gapUs` microseconds
    * (0 < us_b − us_a ≤ gapUs), with the gap. `usCol` is an epoch-micros
    * bigint column. */
  def proximityPairs(
      events: DataFrame,
      gapUs: Long,
      userCol: String = "user_id",
      idCol: String = "event_id",
      usCol: String = "us"): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val e = events.select(
      col(userCol).as("_user"), col(idCol).as("_id"), col(usCol).cast("bigint").as("_us"))
    val a = e.select(col("_user"), col("_id").as("id_a"), col("_us").as("us_a"),
      explode(array(floor(col("_us") / gapUs), floor(col("_us") / gapUs) + 1)).as("_bucket"))
    val b = e.select(col("_user"), col("_id").as("id_b"), col("_us").as("us_b"),
      floor(col("_us") / gapUs).as("_bucket"))
    a.join(b, Seq("_user", "_bucket"))
      .where(col("us_b") - col("us_a") > 0 && col("us_b") - col("us_a") <= gapUs)
      .select(col("_user").as(userCol), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
  }
}
