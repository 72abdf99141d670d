package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, expr, lit, session_window, window}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.ingest.ValidateRoute.Routed

/** Structured-Streaming topology — the reference's two-query design
  * (`spark/jobs/validate_json.py:656-702`, SURVEY.md §2.8 ST1-ST10)
  * with a parquet sink replacing Kafka (zero-egress analog: the
  * reference's per-row `topic` column routing becomes `partitionBy(topic)`).
  * The production Kafka source/sink wiring — subscribePattern reader,
  * idempotent per-row-topic sink — lives in [[Kafka]]; both sources emit
  * the same `(topic, value, timestamp)` envelope, so `ValidateRoute.plan`
  * and these sinks bind to either unchanged.
  *
  * Scale: exactly TWO streaming queries regardless of topic count — the
  * per-topic branches are unioned narrow plans, so offsets/checkpoints and
  * sink commits stay O(1) in topic count. Parquet sink is exactly-once per
  * micro-batch; 5 s processing-time trigger in production,
  * `Trigger.AvailableNow` for deterministic tests/backfills.
  */
object Streaming {

  /** Message-envelope source from a directory of JSON files (test/dev stand-in
    * for the Kafka source; same columns: topic, value, timestamp). */
  def jsonStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  private def sink(df: DataFrame, outDir: String, chkDir: String, name: String,
                   trigger: Trigger): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format("parquet")
      .partitionBy("topic")
      .option("path", s"$outDir/$name")
      .option("checkpointLocation", s"$chkDir/$name")
      .outputMode("append")
      .trigger(trigger)
      .queryName(name)

  /** Exactly-once-effect streaming sink into a [[graft.warehouse
    * .Snapshots]] versioned table: each micro-batch lands as ONE atomic
    * snapshot commit (batch-id-tagged for replay idempotence), so
    * downstream consumers get time travel and an O(delta) change feed
    * (`changesBetween`) over a live stream — the streaming analog of
    * the reference's continuously-loaded warehouse tables. At-least-
    * once `foreachBatch` delivery + idempotent `appendBatch` = each
    * batch's rows appear in exactly one committed version. */
  def snapshotSink(df: DataFrame, tableDir: String, chkDir: String,
                   trigger: Trigger = Trigger.AvailableNow())
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.warehouse.Snapshots.appendBatch(
          batch.sparkSession, tableDir, batch, batchId): Unit
      }
      .option("checkpointLocation", chkDir)
      .outputMode("append")
      .trigger(trigger)
      .queryName("snapshot-sink")

  /** Streaming MERGE INTO: each micro-batch upserts into the versioned
    * table by `keyCols`, exactly once per batch id — the CDC-into-
    * warehouse sink. Feed it latest-per-key batches (e.g. a changelog
    * reduced by `Star.latestPerKey` inside the batch) and the table
    * converges to current state with full version history; replays are
    * suppressed by the batch record even after later batches committed,
    * so an old batch can never clobber newer values. */
  def upsertSink(df: DataFrame, tableDir: String, chkDir: String,
                 keyCols: Seq[String],
                 trigger: Trigger = Trigger.AvailableNow())
      : DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.warehouse.Snapshots.upsertBatch(
          batch.sparkSession, tableDir, batch, batchId, keyCols): Unit
      }
      .option("checkpointLocation", chkDir)
      .outputMode("update")
      .trigger(trigger)
      .queryName("upsert-sink")

  /** ST6: start the two fan-in queries (validated-all, rejected-all). */
  def startRoutes(routed: Routed, outDir: String, chkDir: String,
                  trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : (StreamingQuery, StreamingQuery) =
    (sink(routed.validated, outDir, chkDir, "validated-all", trigger).start(),
     sink(routed.rejected, outDir, chkDir, "rejected-all", trigger).start())

  /** ST8: streaming tumbling-window aggregation with watermark — the
    * streaming form of the batch hourly rollups (Quality.hourlyCounts).
    * State is bounded by the watermark: windows older than `lateness`
    * behind the max event time are finalized and evicted. Append mode
    * emits each window exactly once, on watermark passage. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "1 hour",
                     lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** ST8 (session variant): gap-based session windows over the stream —
    * Spark's native `session_window` keeps one open window per key in
    * the state store, merging events that arrive within `gap` of it and
    * emitting the window once the watermark passes its close. The same
    * expression runs in batch (see the parity spec), which is what makes
    * backfill identical to live processing. Batch-side equivalent for
    * retrospective analysis: [[graft.ext.Relational.sessionize]] (window
    * lag/cumsum — no state store needed).
    */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String = "30 minutes",
                    lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("session"), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** ST10: ingest-time materialized-view propagation — apply a batch
    * transform to every micro-batch (ClickHouse MV semantics: the MV SELECT
    * body runs per insert block; backfill = the same transform run over
    * history in batch). */
  def foreachBatchIngest(stream: DataFrame, transform: DataFrame => DataFrame,
                         sinkPath: String, chkDir: String,
                         trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        transform(batch).write.mode("append").parquet(sinkPath)
      }
      .option("checkpointLocation", chkDir)
      .trigger(trigger)
      .start()

  /** Stream-stream interval join: each left row matches right rows of the
    * same key whose event time falls in `[lt - lookback, lt]` — the
    * streaming twin of [[graft.ext.Relational.rangeJoin]] (purchase ⋈
    * clicks in the preceding hour, impression ⋈ conversion windows).
    *
    * State bounds (the part that matters at 100 TB): BOTH sides carry a
    * watermark and the join condition bounds event time in BOTH
    * directions, so Spark evicts buffered rows once the watermark passes
    * their match window — state is O(rows within lateness+lookback), not
    * O(stream history). Inner joins emit as matches arrive; outer-join
    * null-matches emit only when the watermark CLOSES a row's window
    * (stragglers still inside the final watermark never emit — feed a
    * closing batch or accept the tail in AvailableNow backfills).
    *
    * Column contract: both inputs must already expose distinct names
    * (prefix beforehand); `leftTs`/`rightTs` are timestamp columns.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   lookback: String = "1 hour",
                   lateness: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, lateness)
    val r = right.withWatermark(rightTs, lateness)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $lookback") &&
        col(rightTs) <= col(leftTs),
      joinType)
  }
}
