package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Structured Streaming operators over the `events` stream shape.
  *
  * The reference has no streaming surface (batch pcap files only — SURVEY
  * §2B "Streaming" row); this is the documented extension path (SURVEY
  * §7.6.4): the same transforms run identically on a batch DataFrame and a
  * `readStream` DataFrame, so every operator is testable against its batch
  * twin and deployable on a live source unchanged.
  */
object EventPipeline extends Serializable {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double,
      props: String)

  final case class UserSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  /** State buffer in epoch-micros + value-cents: exact integer arithmetic
    * so the streaming result hash-matches the SQL-islands oracle (doubles
    * folded in arrival order would drift from decimal-exact SQL sums). */
  final case class SessionBuf(startUs: Long, lastUs: Long, nEvents: Long, sumCents: Long)

  private def toMicros(t: Timestamp): Long =
    (t.getTime / 1000) * 1000000L + t.getNanos / 1000
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }
  private def cents(v: Double): Long = math.round(v * 100)

  /** Tumbling event-time window aggregate with a watermark bounding state.
    * Works on batch and streaming inputs alike. */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(
        col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window per-user rate (events per 10 min, sliding by 5). */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): closes a session when the user is idle
    * longer than `gapMinutes`; open sessions stay in state across
    * micro-batches. State per key is O(1) — safe at any cardinality. */
  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Int): Dataset[UserSession] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60000000L

    def close(uid: Long, s: SessionBuf): UserSession =
      UserSession(uid, fromMicros(s.startUs), fromMicros(s.lastUs),
        s.nEvents, s.sumCents / 100.0)

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionBuf]) =>
          val sorted = it.toSeq.sortBy(e => (toMicros(e.ts), e.event_id))
          var closed = List.empty[UserSession]
          var cur = state.getOption
          for (e <- sorted) {
            val t = toMicros(e.ts)
            cur match {
              case Some(s) if t - s.lastUs <= gapUs =>
                cur = Some(SessionBuf(s.startUs, t, s.nEvents + 1, s.sumCents + cents(e.value)))
              case Some(s) =>
                closed ::= close(uid, s)
                cur = Some(SessionBuf(t, t, 1, cents(e.value)))
              case None =>
                cur = Some(SessionBuf(t, t, 1, cents(e.value)))
            }
          }
          cur.foreach(state.update)
          closed.reverse.iterator
      }
  }

  /** Streaming entry: watch a directory of event JSON files. The schema is
    * the `events` table's; the transforms above apply unchanged. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .json(dir)
}
