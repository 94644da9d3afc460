package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface.
  *
  * The reference has NO streaming engine (SURVEY.md §2.9) — its
  * incrementality is batch freshness predicates. This module provides the
  * Spark-native streaming equivalents for the same pipeline shapes:
  *
  *  - `incrementalPipeline`: the KG parse stage under
  *    `readStream + Trigger.AvailableNow` — exactly the reference's
  *    "process what's new, then stop" semantics (download_if_needed /
  *    needed(), documentstore.py:400-470) with checkpointed progress
  *    instead of mtime comparison;
  *  - `windowedEventCounts`: watermarked sliding-window aggregation over
  *    an event stream (the `events` table shape);
  *  - `sessionize`: per-user session assembly via mapGroupsWithState —
  *    the custom-state operator a training-data pipeline uses for
  *    clickstream/interaction grouping.
  */
object StreamOps {

  /** Watermarked tumbling-window event counts: event-time grouping with
    * late-data tolerance. Works identically over a rate/file/kafka source. */
  def windowedEventCounts(events: DataFrame,
                          watermark: String = "10 minutes",
                          window: String = "1 hour"): DataFrame =
    events
      // event-time ops need TIMESTAMP (tz-aware); sources often carry NTZ
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("approx_users"))

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
                         event_type: String)
  final case class Session(user_id: Long, n_events: Long,
                           first_ts: java.sql.Timestamp,
                           last_ts: java.sql.Timestamp, closed: Boolean)
  final case class SessionState(n: Long, first: Long, last: Long)

  /** Stateful sessionization: events per user folded into a running
    * session; a processing-time timeout closes the session. The state
    * machine is the `mapGroupsWithState` canonical shape. */
  def sessionize(events: Dataset[Event],
                 gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(uid, s.n, new java.sql.Timestamp(s.first),
              new java.sql.Timestamp(s.last), closed = true)
          } else {
            val evs = it.toSeq
            val tss = evs.map(_.ts.getTime)
            val prev = state.getOption.getOrElse(
              SessionState(0, tss.min, tss.min))
            val next = SessionState(prev.n + evs.size,
              math.min(prev.first, tss.min), math.max(prev.last, tss.max))
            state.update(next)
            state.setTimeoutDuration(gapMs)
            Session(uid, next.n, new java.sql.Timestamp(next.first),
              new java.sql.Timestamp(next.last), closed = false)
          }
      }
  }

  /** Incremental KG parse under Structured Streaming: watch `inputDir`
    * for new parquet files of the Iceberg-shaped source table, parse each
    * micro-batch through the SAME stage-P function, append doc triples to
    * `outDir`, track progress in `checkpointDir`. Trigger.AvailableNow
    * processes the backlog and stops — the reference's build-until-done
    * semantics, resumable from the checkpoint (north_rule). */
  def incrementalPipeline(spark: SparkSession, inputDir: String,
                          outDir: String, checkpointDir: String,
                          schemaHint: DataFrame): Unit = {
    import spark.implicits._
    val stream = spark.readStream
      .schema(schemaHint.schema)
      .parquet(inputDir)
      .as[graft.model.SourceFile]
    val parsed = graft.kg.KgStages.parseStage(stream)
    val triples = graft.kg.KgStages.docTriplesDf(parsed)
    val q = triples.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // ------------------------------------------------- driver-verified query
  private val memCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The streaming==batch equivalence, driver-verified: the events table
    * read as a FILE STREAM (AvailableNow — process the backlog, stop),
    * windowed-aggregated with the same operator the live pipeline uses,
    * collected via a memory sink. The DuckDB oracle is the plain BATCH
    * aggregation — tumbling 1h windows are epoch-aligned, so
    * window('1 hour').start ≡ date_trunc('hour', ts). */
  def streamEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val src = s"$dir/events.parquet"
    val schema = spark.read.parquet(src).schema
    // the file stream source wants a DIRECTORY of arriving files; the
    // testdata table is a single file — stage it into one (a real feed
    // would be the landing directory itself)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream.schema(schema).parquet(streamDir.toString)
    val agg = windowedEventCounts(stream)
    val name = s"stream_events_${memCounter.incrementAndGet()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()) // emit every window at stop
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .start()
    q.awaitTermination()
    spark.table(name)
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_event_counts" -> streamEventCounts,
  )

  val oracleSql: Map[String, String] = Map(
    "stream_event_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n
         FROM events GROUP BY 1, 2""",
  )
}
