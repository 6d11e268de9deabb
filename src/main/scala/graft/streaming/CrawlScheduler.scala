package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.codec.RobotsCodec

/**
 * X93s: INCREMENTAL politeness scheduling — the streaming twin of
 * `d_crawl_schedule`, run the way a live crawler actually schedules: the
 * frontier arrives in micro-batches and each host's fetch queue must
 * CONTINUE across them (a host's slot counter cannot reset per batch, or
 * two batches would schedule colliding fetch times). State = the next free
 * slot per host, held in the state store; each batch's rows for a host
 * sort by doc_id, robots-blocked URLs drop (the codec's reference decision
 * — spec-proven equal to the relational max_by the batch row runs), and
 * survivors take consecutive slots continuing from the stored counter.
 *
 * Scale shape: state is ONE long per host (host-bounded, the same bound as
 * the robots rules plane); per batch the work is the per-host group sort —
 * the same irreducible per-host ordering exchange as the batch row. The
 * rules/delay tables ride the closure (origin-bounded, broadcast-sized).
 */
object CrawlScheduler {

  final case class FrontierUrl(doc_id: Long, host: String, domain: String,
      path: String)

  final case class Scheduled(doc_id: Long, host: String, slot: Long,
      fetch_at_ms: Long, worker: Long)

  /** First 48 bits of md5(host) mod 8 — bit-identical to the engine-wide
    * `hash48` column (conv(substr(md5(host), 1, 12), 16, 10) % 8). */
  def worker8(host: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(host.getBytes("UTF-8"))
    val hex = md.take(6).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 8
  }

  def schedule(urls: Dataset[FrontierUrl],
      rules: Map[String, Vector[RobotsCodec.RobotsRule]],
      delays: Map[String, Long]): Dataset[Scheduled] = {
    import urls.sparkSession.implicits._
    urls.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: String, it: Iterator[FrontierUrl], state: GroupState[Long]) =>
          var slot = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).flatMap { u =>
            if (RobotsCodec.isAllowed(
                rules.getOrElse(u.domain, Vector.empty), u.path)) {
              val sl = slot
              slot += 1
              Some(Scheduled(u.doc_id, host, sl,
                sl * delays.getOrElse(u.domain, 1L) * 1000L, worker8(host)))
            } else None
          }
          state.update(slot)
          out.iterator
      }
  }
}
