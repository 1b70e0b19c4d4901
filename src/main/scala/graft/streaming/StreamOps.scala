package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface.
  *
  * The reference is strictly batch (SURVEY.md §2.8) — its only online path is
  * a synchronous Flask API (app_multi.py:154-253). The Spark-native
  * equivalents here are:
  *   - a watermarked sliding-window aggregation over the events stream
  *     (the standard ingest-monitoring shape: counts/values per type per
  *     window, late data bounded by the watermark);
  *   - a stateful per-key session/dedup operator via mapGroupsWithState
  *     (the online analog of the batch mention dedup A3: first-seen wins
  *     within a TTL) — custom state where built-in operators can't express
  *     the semantics;
  *   - streaming DOCUMENT dedup for incremental crawls via
  *     flatMapGroupsWithState keyed by content fingerprint (first copy
  *     emitted, re-crawls suppressed, TTL-bounded state);
  *   - foreachBatch bridging micro-batches onto the batch NER annotate stage
  *     (the online-NER path: each micro-batch of sentences runs the same
  *     broadcast-trie + scorer ensemble used in batch, so online and offline
  *     extraction CANNOT drift).
  */
object StreamOps {

  /** Windowed event aggregation: 1-minute windows sliding 30s, 2-minute
    * watermark. Works on any DataFrame with (ts timestamp, event_type
    * string, value double) — batch or streaming (same plan, Catalyst decides
    * the stateful physical ops for the stream case).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      // parquet written by arrow carries TIMESTAMP_NTZ; watermarks require
      // an instant type
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute", "30 seconds"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("total_value"))

  final case class SeenState(firstTs: Long, count: Long)
  final case class EventKey(userId: Long, eventType: String)
  final case class EventIn(userId: Long, eventType: String, tsMs: Long)
  final case class DedupOut(
      userId: Long,
      eventType: String,
      firstTsMs: Long,
      dupCount: Long
  )

  /** Stateful first-seen dedup with TTL: emits one row per (user, type) with
    * how many duplicates were suppressed. mapGroupsWithState with processing-
    * time timeout — the KeyValueGroupedDataset custom-state path.
    */
  def dedupWithState(
      events: Dataset[EventIn],
      ttl: String = "10 minutes"
  ): Dataset[DedupOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(e => EventKey(e.userId, e.eventType))
      .mapGroupsWithState[SeenState, DedupOut](
        GroupStateTimeout.ProcessingTimeTimeout) {
        (key: EventKey, rows: Iterator[EventIn], state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            DedupOut(key.userId, key.eventType, s.firstTs, s.count - 1)
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(
              SeenState(batch.map(_.tsMs).min, 0L))
            val next = SeenState(prev.firstTs, prev.count + batch.size)
            state.update(next)
            state.setTimeoutDuration(ttl)
            DedupOut(key.userId, key.eventType, next.firstTs, next.count - 1)
          }
      }
  }

  final case class DocIn(docId: Long, fp: Long, tsMs: Long)
  final case class FirstSeen(fp: Long, docId: Long, tsMs: Long)

  /** Streaming exact-dedup for INCREMENTAL CRAWLS: keyed by content
    * fingerprint (e.g. `TextOps.fingerprint`/`rollingHash` of the
    * normalized text), a document is EMITTED only the first time its
    * fingerprint is seen — re-crawls and mirrors arriving in later
    * micro-batches are suppressed. flatMapGroupsWithState (not map): the
    * output is 0 or 1 rows per key per batch, and within a batch the
    * (tsMs, docId)-minimal copy wins so the emission is deterministic
    * under any micro-batch partitioning.
    *
    * State is one presence mark per fingerprint, partitioned by key
    * across executors (RocksDB state store in production), with a
    * processing-time TTL so state size is bounded by the crawl window
    * rather than corpus history — the standard freshness/memory tradeoff:
    * a copy arriving after `ttl` of key silence is treated as new.
    * Pass `ttl = None` for BOUNDED replays (Trigger.AvailableNow):
    * processing-time timeouts assume an always-on query, and their batch
    * scheduler races the end-of-data checkpoint cleanup of a bounded one
    * (observed as a spurious FileNotFound on the temp checkpoint).
    */
  def streamingDocDedup(
      docs: Dataset[DocIn],
      ttl: Option[String] = Some("30 minutes")
  ): Dataset[FirstSeen] = {
    import docs.sparkSession.implicits._
    val conf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[Long, FirstSeen](OutputMode.Append, conf) {
        (fp: Long, rows: Iterator[DocIn], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val isNew = !state.exists
            // update only on first sight — rewriting an unchanged presence
            // mark per duplicate per micro-batch is pure state-store write
            // amplification on exactly this operator's hot workload;
            // setTimeoutDuration alone re-arms the sliding TTL
            if (isNew) state.update(1L)
            ttl.foreach(state.setTimeoutDuration)
            if (isNew) {
              val first = rows.minBy(d => (d.tsMs, d.docId))
              Iterator.single(FirstSeen(fp, first.docId, first.tsMs))
            } else Iterator.empty
          }
      }
  }

  /** Run the windowed aggregation as a real stream from a bounded in-memory
    * replay of the events table (rate-limited micro-batches), writing to a
    * memory sink. Returns the query; caller awaits termination/snapshots the
    * sink table. Used by the demo/driver — production would swap source/sink
    * for Kafka/Iceberg without touching `windowedCounts`.
    *
    * Append-mode semantics on a BOUNDED replay: windows newer than
    * (max event time − watermark) are correctly withheld when the stream
    * ends — the emitted rows are a strict subset of the batch result, never
    * different. Callers needing the tail must use Update/Complete mode or a
    * final batch pass.
    */
  /** Production streaming-KG entry: a page stream (any source with the Page
    * schema) → the SAME broadcast-trie annotate + triple assembly as the
    * batch pipeline, written through the built-in parquet FILE SINK. The
    * whole transform chain (sections → sentences → annotate → triples) is
    * narrow flatMaps, so it is directly expressible on a streaming Dataset —
    * no foreachBatch bridge needed, and micro-batch boundaries cannot change
    * a byte (pinned by StreamingSpec's stream/batch parity test).
    *
    * Exactly-once: the file sink records committed files per batch in
    * `outDir/_spark_metadata`; a batch replayed after a crash between the
    * parquet job and the checkpoint offset commit writes new files but never
    * re-commits them to the metadata log, and Spark reads of outDir consult
    * that log — so readers observe each batch exactly once across restarts.
    * (A blind `foreachBatch` + mode("append") — the round-2 form — was only
    * at-least-once in exactly that crash window. Non-Spark readers that list
    * files directly must filter by the metadata log to get the same
    * guarantee.)
    */
  def triplesStream(
      pages: DataFrame, // streaming DF with the Page schema
      b: graft.pipeline.Pipeline.Broadcasts,
      outDir: String,
      checkpointDir: String
  ): StreamingQuery = {
    val spark = pages.sparkSession
    implicit val s: SparkSession = spark
    import spark.implicits._
    graft.pipeline.Triples.fromArtifacts(
      graft.pipeline.Pipeline.artifacts(pages.as[graft.model.Page], b))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  def replayToMemorySink(
      spark: SparkSession,
      eventsParquet: String,
      sinkName: String
  ): StreamingQuery = {
    val schema = spark.read.parquet(eventsParquet).schema
    // the file source requires a DIRECTORY; testdata ships single files —
    // stage a link into a temp dir (cheap, no data copy on same fs)
    val src = java.nio.file.Paths.get(eventsParquet)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) eventsParquet
      else {
        val d = java.nio.file.Files.createTempDirectory("stream_src")
        val target = d.resolve(src.getFileName)
        try java.nio.file.Files.createSymbolicLink(target, src)
        catch { case _: Throwable => java.nio.file.Files.copy(src, target) }
        d.toString
      }
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(streamDir)
    windowedCounts(stream)
      .writeStream
      .queryName(sinkName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .format("memory")
      .start()
  }
}
