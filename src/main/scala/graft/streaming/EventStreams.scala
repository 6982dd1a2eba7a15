package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Open-session state buffer for [[EventStreams.sessionize]] (top-level and
  * public: the state encoder's generated code must reach the constructor).
  */
final case class SessionBuf(start: Long, end: Long, n: Long, sum: Double)

/** Structured Streaming surface over the events table (SURVEY §2.9: the
  * reference is batch-only; this is the idiomatic-Spark extension surface —
  * watermarked windowed aggregation and stateful sessionization). The batch
  * formulations live alongside so the streaming output is checkable against
  * a deterministic batch/oracle result.
  */
object EventStreams {

  /** events schema with `ts` as legacy ns-long (TIMESTAMP(NANOS) parquet
    * read under nanosAsLong). Kept for fixtures that exercise the legacy
    * encoding; [[readEvents]] no longer assumes it.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch (TIMESTAMP(NANOS) parquet)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** File-source stream of events from a directory of parquet files.
    *
    * A file stream needs an explicit schema, but the events table has
    * shipped `ts` under three physical encodings (int64-nanos,
    * TIMESTAMP(micros) NTZ, UTC-adjusted micros). Hardwiring one of them
    * silently corrupts the others — a ns-long divide applied to micros
    * lands every event in 1970 — so probe the directory's ACTUAL type
    * with a one-shot batch read of the already-present files, stream with
    * that schema, and normalize to TimestampType via the same seam the
    * batch reader uses ([[graft.Tables.normalizeEventTs]]). Files arriving
    * later must match the probed encoding — the standard file-source
    * contract (one fixed schema per stream).
    */
  def readEvents(spark: SparkSession, dir: String,
      options: Map[String, String] = Map.empty,
      schema: Option[StructType] = None): DataFrame = {
    val src = schema.getOrElse {
      // the probe applies the same reader options (pathGlobFilter etc.
      // change which files are visible) and turns the zero-files case
      // into an actionable error instead of a bare AnalysisException:
      // an empty landing directory cannot reveal its future encoding,
      // so the caller must say which one arrives (guessing ns-long —
      // the old hardwired behavior — silently 1970-collapses micros
      // data, the worse failure)
      try spark.read.options(options).parquet(dir).schema
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"readEvents: cannot probe the events encoding at $dir " +
              "(no parquet files yet?). Pass schema=Some(...) matching " +
              "the encoding the producer will write (e.g. eventSchema " +
              "for legacy int64-nanos).", e)
      }
    }
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(src).options(options).parquet(dir))
  }

  /** Tumbling-window counts/sums with a watermark for late data. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Batch equivalent of [[windowedAgg]] (same output schema, no watermark). */
  def windowedAggBatch(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exactly-once dedup: drop events whose `event_id` was
    * already seen, for duplicates arriving within the watermark horizon
    * (at-least-once upstream → exactly-once downstream). State is one
    * entry per key, expired by the watermark, so memory is bounded by
    * rate × horizon — the property that lets this run forever.
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[dedupEvents]]: one row per event_id (rows with the
    * same id are byte-identical upstream duplicates, so "any row" is
    * deterministic).
    */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Stream-stream view→click attribution: each view joined to the same
    * user's clicks landing within `windowMinutes` after it. The time-range
    * condition plus both watermarks is what BOUNDS the join state — either
    * side's buffered rows expire once the other stream's watermark passes
    * the range, so state is rate × window, not the stream's history. The
    * same code runs batch (watermark is a no-op there), which is the
    * oracle-checked form.
    */
  def attributionJoin(events: DataFrame, windowMinutes: Int = 30,
      watermark: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    views.join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        expr("(unix_micros(click_ts) - unix_micros(view_ts)) div 1000000")
          .as("lag_sec"))
  }

  /** Streaming sessionization: per-user sessions split on `gapMinutes` of
    * event-time silence, via flatMapGroupsWithState with event-time timeout.
    * Sessions are emitted when the watermark passes their gap horizon.
    */
  /** Timestamp ↔ microseconds (Timestamp.getTime alone truncates to ms).
    * floorDiv/floorMod, not `/`/`%`: truncation toward zero flips the
    * sub-second sign for pre-epoch instants (−0.5 s would round-trip to
    * +0.5 s), and `setNanos` throws outright on a negative remainder.
    */
  private[graft] def tsToMicros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private[graft] def microsToTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 10,
      watermark: String = "30 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60 * 1000000L

    events.withWatermark("ts", watermark)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      // poison-row guard: the source schema is nullable but Event's
      // id/ts/value fields are primitives — one malformed row would
      // otherwise kill the deserializer, and a streaming query replays
      // it from the checkpoint on every restart, wedging the pipeline
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull && col("value").isNotNull)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionBuf], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[List[SessionBuf]]) =>
          if (state.hasTimedOut) {
            val done = state.getOption.getOrElse(Nil).map(b =>
              Session(userId, microsToTs(b.start), microsToTs(b.end), b.n, b.sum))
            state.remove()
            done.iterator
          } else {
            // merge new events into (possibly several) open session buffers:
            // an event joins every buffer within gap reach (bridging them if
            // it falls between two), else opens a new one — exactly the
            // gaps-and-islands semantics of [[sessionizeBatch]], independent
            // of buffer order and of which micro-batch an event arrives in
            val sorted = rows.toSeq.sortBy(e => (tsToMicros(e.ts), e.event_id))
            var bufs = state.getOption.getOrElse(Nil)
            sorted.foreach { e =>
              val t = tsToMicros(e.ts)
              val (near, far) = bufs.partition(b =>
                t >= b.start - gapUs && t <= b.end + gapUs)
              val merged =
                if (near.isEmpty) SessionBuf(t, t, 1, e.value)
                else near.reduce((x, y) => SessionBuf(
                    math.min(x.start, y.start), math.max(x.end, y.end),
                    x.n + y.n, x.sum + y.sum)) match {
                  case b => SessionBuf(math.min(b.start, t), math.max(b.end, t),
                    b.n + 1, b.sum + e.value)
                }
              bufs = merged :: far
            }
            // emit sessions already beyond the watermark's reach
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (closed, open) = bufs.partition(b => wmUs > b.end + gapUs)
            if (open.nonEmpty) {
              state.update(open)
              state.setTimeoutTimestamp((open.map(_.end).max + gapUs) / 1000L + 1L)
            } else state.remove()
            closed.map(b => Session(userId, microsToTs(b.start),
              microsToTs(b.end), b.n, b.sum)).iterator
          }
      }
  }

  /** Batch sessionization (gaps-and-islands): identical session boundaries
    * to [[sessionize]], expressed with window functions — this is the
    * oracle-checkable registry form.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 10): DataFrame =
    withSessionIdx(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("session_start"), col("n_events"), col("sum_value"))

  /** Gap sessions as [start, end] TIMESTAMP intervals — the interval
    * side of [[graft.ops.TemporalOps.pointInIntervalJoin]] (assign any
    * point stream back to the session containing it). Same boundaries
    * as [[sessionizeBatch]] by shared construction.
    */
  def sessionIntervals(events: DataFrame, gapMinutes: Int = 10): DataFrame =
    withSessionIdx(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"))

  /** The shared gaps-and-islands kernel: session_idx per (user, event). */
  private def withSessionIdx(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60 * 1000000L
    events
      // SAME null-row exclusion as the streaming path: without it a null
      // value/id row would count toward batch sessions while streaming
      // drops it, silently breaking the stream==batch equivalence the
      // suite proves
      .filter(col("event_id").isNotNull && col("ts").isNotNull &&
        col("user_id").isNotNull && col("value").isNotNull)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }
}
