package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observation of a keyed value at an event time (file-scope case
  * classes: Encoders + task serialization need stable classes, not
  * test-local captures). */
case class Observation(key: String, ts: Timestamp, value: String)

/** An emitted value change: the new value, what it replaced (null on the
  * key's first observation), and the running change count for the key. */
case class ValueChange(key: String, ts: Timestamp, value: String,
                       prev_value: String, change_seq: Long)

/** Per-key tracking state persisted in the state store. */
case class TrackState(lastValue: Option[String], lastTsMs: Long,
                      nChanges: Long)

/** ST9+ custom state: CDC-style change detection with
  * `flatMapGroupsWithState` — the streaming twin of the batch
  * [[graft.warehouse.Scd.scd2]] change collapse. Each key's latest value
  * lives in the state store; a micro-batch emits one row per observed
  * CHANGE (no-op observations are absorbed), so a noisy telemetry stream
  * compacts to its version history — feed the output to the SCD2 build
  * or a compacted topic.
  *
  * Semantics (pinned by StatefulSpec):
  *  - within a batch, a key's observations process in (ts, value) order
  *    — deterministic under any arrival order;
  *  - an observation older than the key's tracked ts is DROPPED (late
  *    data does not rewrite history; the source watermark bounds how
  *    stale replays can get);
  *  - first observation of a key emits with prev_value = null;
  *  - with an event-time TTL, state idle past the watermark minus TTL is
  *    evicted — a key reappearing after eviction re-emits as "first"
  *    (bounded state at 100 TB beats perfect suppression; the same
  *    trade-off as the reference's watermarked dedup).
  *
  * Scale: state is one small record per ACTIVE key, hash-partitioned
  * across executors; each micro-batch shuffles only its own rows.
  */
object Stateful {

  /** Project a frame to the (key, ts, value) observation contract,
    * optionally watermarked (required for the TTL path when streaming). */
  def observations(df: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, watermark: Option[String] = None)
      : Dataset[Observation] = {
    val spark = df.sparkSession
    import spark.implicits._
    // null/uncastable event times are dropped here: they carry no order,
    // and a null ts reaching the state function would fail the task (and
    // in streaming, wedge the query in a replay loop)
    val base = df.select(col(keyCol).cast("string").as("key"),
        col(tsCol).cast("timestamp").as("ts"),
        col(valCol).cast("string").as("value"))
      .filter(col("ts").isNotNull)
    watermark.fold(base)(w => base.withWatermark("ts", w)).as[Observation]
  }

  /** Change-detection transform. Works on a streaming OR batch Dataset —
    * on batch input Spark runs the same function with empty initial
    * state, which is what the stream==batch parity spec exercises.
    *
    * @param ttl optional event-time state TTL (e.g. "30 minutes");
    *            requires watermarked observations when streaming
    */
  def changes(obs: Dataset[Observation], ttl: Option[String] = None)
      : Dataset[ValueChange] = {
    val spark = obs.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    def fn(key: String, it: Iterator[Observation],
           state: GroupState[TrackState]): Iterator[ValueChange] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var st = state.getOption.getOrElse(TrackState(None, Long.MinValue, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[ValueChange]
      it.toSeq.sortBy(o => (o.ts.getTime, o.value)).foreach { o =>
        if (o.ts.getTime >= st.lastTsMs) {
          if (st.lastValue != Option(o.value)) {
            out += ValueChange(key, o.ts, o.value,
              st.lastValue.orNull, st.nChanges + 1)
            st = TrackState(Option(o.value), o.ts.getTime, st.nChanges + 1)
          } else st = st.copy(lastTsMs = o.ts.getTime)
        }
      }
      state.update(st)
      // evict once the watermark passes lastTs + ttl
      ttl.foreach(t => state.setTimeoutTimestamp(st.lastTsMs, t))
      out.iterator
    }

    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }
}
