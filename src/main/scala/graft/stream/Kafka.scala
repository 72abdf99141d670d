package graft.stream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{DataStreamReader, DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

import graft.ingest.ValidateRoute.Routed

/** Kafka source/sink wiring for the ingest topology — the reference's
  * actual S1/S2 (`spark/jobs/validate_json.py:540-547,667-683`):
  * `readStream.format("kafka")` with a negative-lookahead
  * `subscribePattern`, and a Kafka sink with idempotent produce where the
  * destination topic rides each row's `topic` column.
  *
  * Layering: the option maps ([[sourceOptions]]/[[sinkOptions]]) and the
  * wire projections ([[decode]]/[[encode]]) are pure and unit-tested; the
  * [[reader]]/[[writer]] functions are thin compositions over them. Only
  * the final `.load()`/`.start()` needs the `spark-sql-kafka` connector
  * and a broker on the classpath — everything up to that point (including
  * [[decode]] feeding `ValidateRoute.plan` unchanged) is verified broker-
  * free against [[wireSchema]], the exact schema Spark's Kafka source
  * emits.
  *
  * Scale: `subscribePattern` keeps topic discovery broker-side (new
  * `soccer.*` topics join the stream without a restart, SURVEY §2.1 S1);
  * `maxOffsetsPerTrigger` bounds micro-batch size so one backlogged topic
  * cannot blow a trigger's memory; `minPartitions` lets a hot 3-partition
  * topic fan out to more Spark tasks than Kafka partitions. The sink's two
  * queries stay O(1) in topic count because routing is a per-row column,
  * not a per-topic sink (VJ:667-683).
  *
  * Security options (SASL/SSL etc., VJ:27-37) are deployment secrets, not
  * engine semantics — pass them via `extra` (e.g.
  * `"kafka.security.protocol" -> "SASL_SSL"`); nothing is hardcoded here.
  */
object Kafka {

  /** The schema `format("kafka")` sources emit (Spark's Kafka connector
    * contract; stable across Spark 3.x/4.x). Fixtures built against this
    * schema exercise [[decode]] exactly as a live source would. */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The reference's subscription regex (VJ:543): every `<prefix>.*` topic
    * except the engine's own `validated.` / `rejected.` output topics —
    * the guard that keeps the router from consuming its own produce. */
  def topicPattern(prefix: String = "soccer"): String =
    s"^(?!validated\\.|rejected\\.)$prefix\\..*"

  /** Source options (VJ:540-547). `failOnDataLoss=false` matches the
    * reference: a retention-expired offset logs and skips rather than
    * killing the 24/7 query. */
  def sourceOptions(bootstrap: String,
                    subscribePattern: String = topicPattern(),
                    startingOffsets: String = "earliest",
                    failOnDataLoss: Boolean = false,
                    maxOffsetsPerTrigger: Option[Long] = None,
                    minPartitions: Option[Int] = None,
                    extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribePattern" -> subscribePattern,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      minPartitions.map("minPartitions" -> _.toString) ++
      extra

  /** Sink options (VJ:667-683). Idempotent produce de-duplicates broker-
    * side on retry, which together with the checkpoint's exactly-once
    * micro-batch commit gives the reference's effective delivery contract. */
  def sinkOptions(bootstrap: String,
                  checkpointLocation: String,
                  idempotent: Boolean = true,
                  extra: Map[String, String] = Map.empty): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "checkpointLocation" -> checkpointLocation,
      "kafka.enable.idempotence" -> idempotent.toString) ++
      extra

  /** Kafka wire → graft envelope: the projection that makes
    * `ValidateRoute.plan` source-agnostic. `value` is UTF-8-decoded
    * (tombstones stay NULL — the parse-reject route keys them, see
    * `ValidateRoute.planTopic`); `timestamp` is Kafka's broker timestamp,
    * which `ensureTimestamps` uses as the repair fallback (`kafka_ts`).
    * Narrow projection — no shuffle, stays in the source stage. */
  def decode(raw: DataFrame): DataFrame =
    raw.select(
      col("topic"),
      col("value").cast(StringType).as("value"),
      col("timestamp"))

  /** Envelope → Kafka wire (VJ:668-671): cast to the string triple the
    * sink serializes; the sink reads each row's `topic` column as its
    * destination. `ValidateRoute`'s envelope already emits exactly these
    * three columns, so this is an order/type pin, not a reshape. */
  def encode(df: DataFrame): DataFrame =
    df.selectExpr(
      "CAST(topic AS STRING) AS topic",
      "CAST(key AS STRING) AS key",
      "CAST(value AS STRING) AS value")

  /** Configured streaming reader; production calls `.load()` then
    * [[decode]] (or just [[stream]]). */
  def reader(spark: SparkSession, options: Map[String, String]): DataStreamReader =
    spark.readStream.format("kafka").options(options)

  /** S1 end-to-end: the Kafka analog of `Streaming.jsonStream`, emitting
    * the identical `(topic, value, timestamp)` contract. */
  def stream(spark: SparkSession, options: Map[String, String]): DataFrame =
    decode(reader(spark, options).load())

  /** Configured sink writer; production calls `.start()`. Append mode +
    * 5 s processing-time trigger mirror VJ:676-680. */
  def writer(df: DataFrame, options: Map[String, String], queryName: String,
             trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : DataStreamWriter[Row] =
    encode(df).writeStream
      .format("kafka")
      .options(options)
      .outputMode("append")
      .trigger(trigger)
      .queryName(queryName)

  /** S2/ST6: the two-query fan-in topology against Kafka sinks — the
    * production twin of `Streaming.startRoutes` (VJ:682-683). Returns the
    * configured writers; `.start()` each on a cluster with the connector. */
  def routeWriters(routed: Routed, bootstrap: String, chkRoot: String,
                   trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
                   extra: Map[String, String] = Map.empty)
      : (DataStreamWriter[Row], DataStreamWriter[Row]) =
    (writer(routed.validated,
       sinkOptions(bootstrap, s"$chkRoot/validated-all", extra = extra),
       "validated-all", trigger),
     writer(routed.rejected,
       sinkOptions(bootstrap, s"$chkRoot/rejected-all", extra = extra),
       "rejected-all", trigger))
}
