package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.EventOps

/**
 * Pins the fixture-schema contract for event time (round-8 regression: the
 * driver regenerated events.parquet from TIMESTAMP(NANOS) to
 * TIMESTAMP(MICROS) and every `ts div 1000` consumer died at analysis).
 * The contract: whatever parquet representation an upstream writer picks —
 * int64 nanoseconds, instant TIMESTAMP(MICROS), or wall-clock
 * TIMESTAMP(MICROS) NTZ — `EventOps.withTsUs` yields the SAME canonical
 * epoch-micros `ts_us` column, so the next driver-side regeneration is a
 * no-op for every consumer.
 */
class EventTimeContractSpec extends SparkSpec {

  // Instants spanning a leap-second-free range; values chosen so nanos,
  // micros, and NTZ round-trips are all exact.
  private val micros = Seq(1700000000000000L, 1700000000123456L,
    1700003600999999L, 1577836800000000L)

  private def writeRead(tag: String)(build: DataFrame => DataFrame): DataFrame = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft-evt-$tag").toString
    val base = micros.zipWithIndex.toDF("us", "event_id")
    build(base).write.mode("overwrite").parquet(dir)
    // same read path as SparkEntry.t(): nanos escape hatch armed, UTC session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(dir)
  }

  private def tsUs(df: DataFrame): Map[Int, Long] = {
    import spark.implicits._
    EventOps.withTsUs(df).select(col("event_id").cast("int"), col("ts_us"))
      .as[(Int, Long)].collect().toMap
  }

  test("withTsUs normalizes int64-nanos, TIMESTAMP, and TIMESTAMP_NTZ to the same ts_us") {
    val expected = micros.zipWithIndex.map { case (us, i) => i -> us }.toMap

    // 1. int64 nanos (what nanosAsLong makes of TIMESTAMP(NANOS) parquet)
    val asLong = writeRead("long")(_.select((col("us") * 1000L).as("ts"), col("event_id")))
    assert(asLong.schema("ts").dataType === LongType)
    assert(tsUs(asLong) === expected)

    // 2. instant-typed TIMESTAMP(MICROS), isAdjustedToUTC=true
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val asTs =
      try writeRead("tsz")(_.select(timestamp_micros(col("us")).as("ts"), col("event_id")))
      finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    assert(asTs.schema("ts").dataType === TimestampType)
    assert(tsUs(asTs) === expected)

    // 3. wall-clock TIMESTAMP(MICROS) NTZ, isAdjustedToUTC=false — the
    // round-8 driver fixtures (pandas/pyarrow default)
    val asNtz = writeRead("ntz")(
      _.select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("event_id")))
    assert(asNtz.schema("ts").dataType === TimestampNTZType)
    assert(tsUs(asNtz) === expected)
  }

  test("withTsUs rejects representations it cannot normalize") {
    import spark.implicits._
    val bad = Seq(("2023-11-14", 0)).toDF("ts", "event_id")
    val e = intercept[IllegalArgumentException](EventOps.withTsUs(bad))
    assert(e.getMessage.contains("unsupported event-time type"))
  }
}
