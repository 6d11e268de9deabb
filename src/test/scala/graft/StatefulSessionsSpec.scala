package graft

import org.apache.spark.sql.functions._

import graft.streaming.StatefulSessions

/** Custom-state streaming specs: mapGroupsWithState session counts carrying
  * open sessions across micro-batches, and flatMapGroupsWithState closed-
  * session emission on BOTH paths — closed-by-later-event and
  * closed-by-event-time-timeout (watermark flushes an idle user and drops
  * its state). */
class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800L * 1000000L // 30 min, matching ev_sessionize
  private def min2us(m: Long): Long = m * 60L * 1000000L
  // event times anchored in 2024 so timeout stamps stay far above the
  // initial (epoch-0) watermark
  private val Base = 1700000000L * 1000000L

  test("mapGroupsWithState: open sessions merge across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, Long)](spark)
    val counts = StatefulSessions.sessionCounts(
      input.toDF().toDF("user_id", "us", "event_id"), GapUs)
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("ss_counts").start()
    try {
      // user 1: 0 + 10min (batch 1) then 20min (batch 2) → ONE session: the
      // open tail must survive the batch boundary in the state store
      // user 2: 0 (batch 1) then 40min (batch 2) → TWO sessions
      input.addData((1L, Base, 0L), (1L, Base + min2us(10), 1L), (2L, Base, 2L))
      q.processAllAvailable()
      input.addData((1L, Base + min2us(20), 3L), (2L, Base + min2us(40), 4L))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("ss_counts").groupBy("user_id")
      .agg(max("n_sessions").as("s"), max("n_events").as("e"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(fin(1L) === ((1L, 3L)), s"user 1 session did not merge across batches: $fin")
    assert(fin(2L) === ((2L, 2L)), s"user 2 gap did not split: $fin")
  }

  test("transformWithState: same fold, RocksDB provider, state survives micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    StatefulSessions.withRocksDbStateStore(spark) {
      val input = MemoryStream[(Long, Long, Long)](spark)
      val counts = StatefulSessions.sessionCountsTws(
        input.toDF().toDF("user_id", "us", "event_id"), GapUs)
      val q = counts.writeStream.outputMode("update")
        .format("memory").queryName("ss_tws").start()
      try {
        // identical scenario to the mapGroupsWithState test: the open tail
        // session must survive the batch boundary in the named ValueState
        input.addData((1L, Base, 0L), (1L, Base + min2us(10), 1L), (2L, Base, 2L))
        q.processAllAvailable()
        input.addData((1L, Base + min2us(20), 3L), (2L, Base + min2us(40), 4L))
        q.processAllAvailable()
      } finally q.stop()
      val fin = spark.table("ss_tws").groupBy("user_id")
        .agg(max("n_sessions").as("s"), max("n_events").as("e"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(fin(1L) === ((1L, 3L)), s"user 1 session did not merge across batches: $fin")
      assert(fin(2L) === ((2L, 2L)), s"user 2 gap did not split: $fin")
    }
  }

  test("transformWithState MapState/ListState: per-key increments and the top-k list persist across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    StatefulSessions.withRocksDbStateStore(spark) {
      val input = MemoryStream[(Long, String, Long)](spark)
      val out = StatefulSessions.activitySummaryTws(
        input.toDF().toDF("user_id", "event_type", "event_id"), topK = 3)
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("ss_act").start()
      try {
        input.addData((1L, "view", 10L), (1L, "view", 7L), (1L, "click", 3L))
        q.processAllAvailable()
        // second batch: the click count must INCREMENT the map entry (not
        // restart at 1), a new type must add a key, and id 20 must displace
        // 3 from the top-3 list carried over in ListState
        input.addData((1L, "click", 20L), (1L, "error", 1L))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("ss_act").as[(Long, Long, Long, Seq[Long])].collect()
      val fin = rows.filter(_._1 == 1L).maxBy(_._3)
      assert(fin === ((1L, 3L, 5L, Seq(20L, 10L, 7L))),
        s"composite state did not accumulate across batches: ${rows.toSeq}")
    }
  }

  test("flatMapGroupsWithState: emits on close-by-event AND on watermark timeout, dropping state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Long, Long, Long)](spark)
    val closed = StatefulSessions.closedSessions(
      input.toDF().toDF("user_id", "us", "event_id"), GapUs, watermarkDelay = "1 minute")
    val q = closed.writeStream.outputMode("append")
      .format("memory").queryName("ss_closed").start()
    try {
      input.addData((1L, Base, 0L), (1L, Base + min2us(5), 1L))
      q.processAllAvailable()
      assert(spark.table("ss_closed").count() === 0, "open session emitted early")
      // an event after the gap closes session 1 BY EVENT and opens session 2
      input.addData((1L, Base + min2us(60), 2L))
      q.processAllAvailable()
      // far-future events from ANOTHER user push the watermark past user 1's
      // open-session end + gap (60min + 30min): the TIMEOUT must flush it —
      // the second batch guarantees a batch runs with the advanced watermark
      input.addData((99L, Base + min2us(600), 3L))
      q.processAllAvailable()
      input.addData((99L, Base + min2us(601), 4L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ss_closed")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows.contains((1L, Base, Base + min2us(5), 2L)), s"close-by-event missing: $rows")
    assert(rows.contains((1L, Base + min2us(60), Base + min2us(60), 1L)),
      s"timeout flush missing: $rows")
    // user 99's session is still open (watermark never passed its end+gap)
    assert(!rows.exists(_._1 == 99L), s"open session leaked: $rows")
  }

  test("transformWithState timers: close-by-event AND timer flush on watermark, clearing state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    StatefulSessions.withRocksDbStateStore(spark) {
      val input = MemoryStream[(Long, Long, Long)](spark)
      val closed = StatefulSessions.closedSessionsTws(
        input.toDF().toDF("user_id", "us", "event_id"), GapUs, watermarkDelay = "1 minute")
      val q = closed.writeStream.outputMode("append")
        .format("memory").queryName("ss_closed_tws").start()
      try {
        // identical scenario to the flatMapGroupsWithState timeout test
        input.addData((1L, Base, 0L), (1L, Base + min2us(5), 1L))
        q.processAllAvailable()
        assert(spark.table("ss_closed_tws").count() === 0, "open session emitted early")
        input.addData((1L, Base + min2us(60), 2L))
        q.processAllAvailable()
        input.addData((99L, Base + min2us(600), 3L))
        q.processAllAvailable()
        input.addData((99L, Base + min2us(601), 4L))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("ss_closed_tws")
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(rows.contains((1L, Base, Base + min2us(5), 2L)), s"close-by-event missing: $rows")
      assert(rows.contains((1L, Base + min2us(60), Base + min2us(60), 1L)),
        s"timer flush missing: $rows")
      assert(!rows.exists(_._1 == 99L), s"open session leaked: $rows")
    }
  }
}
