package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.schema.TopicSpec

/** The validate-and-route pipeline — the reference's one Spark job
  * (`spark/jobs/validate_json.py:540-683`) as pure DataFrame→DataFrame
  * functions, so the identical code runs in batch (tests, backfill) and
  * Structured Streaming (production).
  *
  * Input contract: a frame with `topic: string`, `value: string` (JSON
  * payload) and `timestamp` (source metadata time — Kafka's timestamp in
  * the reference). Output: two frames with `(topic, key, value)` — the
  * validated and rejected routes (SURVEY.md §2 P1-P11, U1).
  *
  * Scale design: the whole plan is NARROW — filter / project / union only,
  * no shuffle, no state. One pass over the source feeds 13 validated + 26
  * rejected branches fanned into exactly two sinks; at 100 TB/day this
  * scales linearly with executors because no exchange ever materializes.
  * The optional dedup (A10) is the only stateful piece and shuffles on the
  * state key `(pk, payload_hash)` — bounded by the 48 h watermark.
  */
object ValidateRoute {

  /** Metadata columns excluded from the canonical payload hash
    * (reference `EXCLUDE_FROM_HASH`, VJ:532-536). */
  val excludeFromHash: Set[String] = Set(
    "ingested_at", "evt_ts", "pk", "is_valid",
    "kafka_ts", "json_str", "parse_error", "sport_ok")

  /** Columns stripped before re-serialization (VJ:606). */
  private val metaColsOut = Seq("pk", "evt_ts", "payload_hash", "is_valid")

  /** Epoch floor: `ingested_at` at or before 2020-01-01 is treated as
    * invalid and repaired (VJ:74). */
  val epochFloor: Long = 1577836800L

  /** P1: topic-name extraction from the full topic string. */
  def topicName(df: DataFrame, prefix: String = "soccer"): DataFrame =
    df.withColumn("topic_name",
      regexp_extract(col("topic"), s"^$prefix\\.(.+)$$", 1))

  /** P9: timestamp repair — absurd `ingested_at` falls back to the source
    * metadata timestamp, then to wall-clock; `evt_ts` derived from the
    * repaired value (VJ:73-84). */
  def ensureTimestamps(df: DataFrame): DataFrame = {
    val validSrc = when(col("ingested_at").cast("double") > epochFloor,
      col("ingested_at").cast("double"))
    df.withColumn("ingested_at",
        coalesce(validSrc,
          unix_timestamp(col("kafka_ts")).cast("double"),
          unix_timestamp().cast("double")))
      .withColumn("evt_ts", to_timestamp(from_unixtime(col("ingested_at"))))
  }

  /** P8: primary-key synthesis — null components coalesce to empty string
    * so the key stays stable (VJ:69-71). */
  def addPk(df: DataFrame, pkCols: Seq[String]): DataFrame =
    df.withColumn("pk",
      concat_ws("|", pkCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** P5+P6: required-fields AND-fold plus the sport filter (null sport ⇒
    * invalid; three topics carry no sport field; `player` reads a nested
    * path) (VJ:551-564). */
  def validate(df: DataFrame, spec: TopicSpec): DataFrame = {
    val reqOk = spec.required.map(c => col(c).isNotNull).reduce(_ && _)
    val sportOk: Column = spec.sportField match {
      case Some(path) =>
        when(col(path).rlike(spec.sportPattern), lit(true)).otherwise(lit(false))
      case None => lit(true)
    }
    df.withColumn("is_valid", reqOk && sportOk)
  }

  /** P10: canonical payload hash — remaining columns sorted by name,
    * serialized to JSON, SHA-256 (VJ:567-576). Field order is explicitly
    * sorted so the hash is stable across plans. */
  def addPayloadHash(df: DataFrame): DataFrame = {
    val cols = df.columns.filterNot(excludeFromHash).sorted
    df.withColumn("payload_hash", sha2(to_json(struct(cols.map(col): _*)), 256))
  }

  /** A10: the 48 h watermarked dedup the reference designed but disabled
    * (VJ:598-604) — re-enabled in this engine. On streaming frames this
    * uses `dropDuplicatesWithinWatermark`: state for a key is evicted one
    * watermark after FIRST sight (the semantics the reference wanted —
    * "drop replays within 48 h"), where plain dropDuplicates would keep
    * state keyed on exact event-time equality. Batch frames (backfill)
    * fall back to plain dropDuplicates — same result, no state. */
  def dedup(df: DataFrame, watermark: String = "48 hours"): DataFrame =
    if (df.isStreaming)
      df.withWatermark("evt_ts", watermark)
        .dropDuplicatesWithinWatermark("pk", "payload_hash")
    else df.dropDuplicates("pk", "payload_hash")

  /** P11: drop metadata, re-serialize to the `(topic, key, value)` envelope. */
  private def envelope(df: DataFrame, destTopic: String, drop: Seq[String]): DataFrame = {
    val colsOut = df.columns.filterNot(drop.contains)
    df.withColumn("topic", lit(destTopic))
      .withColumn("key", col("pk").cast("string"))
      .withColumn("value", to_json(struct(colsOut.map(col): _*)))
      .select("topic", "key", "value")
  }

  /** Routed output pair. */
  final case class Routed(validated: DataFrame, rejected: DataFrame)

  /** The full per-topic plan: demux (P2) → strict parse (P3) → flatten (P4)
    * → timestamp repair (P9) → PK (P8) → validation (P5/P6) → hash (P10) →
    * [optional dedup (A10)] → route (P7) → envelope (P11); parse failures
    * form their own rejected branch keyed by `sha2(json_str)` (VJ:582-641).
    */
  def planTopic(raw: DataFrame, spec: TopicSpec, prefix: String = "soccer",
                enableDedup: Boolean = false): (DataFrame, Seq[DataFrame]) = {
    // Parse verdict from the SAME from_json call that extracts fields
    // (PERMISSIVE + columnNameOfCorruptRecord), not a second parse:
    // from_json in PERMISSIVE mode yields an all-null row (not a null
    // struct) for malformed input, which would silently merge parse
    // failures into the schema-reject route, and a separate
    // try_parse_json verdict would parse every payload TWICE — at
    // ingest scale, JSON parsing IS the pipeline's CPU. The corrupt
    // column fires on malformed and non-object JSON (matching the
    // reference's null-struct verdict, VJ:610-625, including `[]` /
    // `null` payloads which try_parse_json waves through); the one
    // divergence is a valid object with an uncastable field
    // (parse-reject here, schema-reject in the reference) — unreachable
    // for the reference's schemas, whose fields are all strings.
    // Deliberately NO per-field references in the verdict: every
    // `data.getField(x)` reference clones the whole from_json expression
    // in the optimized plan, and a field-wise OR over the 48-field
    // player schema OOMed plan optimization across 13 topic branches.
    val corruptCol = "_graft_corrupt"
    require(!spec.schema.fieldNames.contains(corruptCol),
      s"topic ${spec.name}: schema field $corruptCol collides with the parse-verdict column")
    val parseSchema = spec.schema.add(corruptCol, StringType)
    val base = raw
      .filter(col("topic_name") === spec.name)
      .select(
        from_json(col("value").cast("string"), parseSchema,
          Map("columnNameOfCorruptRecord" -> corruptCol)).as("data"),
        col("timestamp").as("kafka_ts"),
        col("value").cast("string").as("json_str"))
      // NULL payloads (Kafka tombstones) must stay on the parse-reject
      // route: from_json(NULL) is a null struct, so the corrupt field
      // alone would read as "parsed fine". json_str non-null guards it.
      // Empty/blank-string payloads ('' / '   ') ALSO yield a null struct
      // with the corrupt column unpopulated — data non-null guards those
      // (a whole-struct null test, not a per-field reference, so it does
      // not clone the from_json expression; see the OOM note above).
      .withColumn("parse_ok",
        col("json_str").isNotNull && col("data").isNotNull &&
          col(s"data.$corruptCol").isNull)

    val parsedOk = base.filter(col("parse_ok"))
      .select(col("data.*"), col("kafka_ts"), col("json_str"))
      .drop(corruptCol)
    val hashed = addPayloadHash(validate(addPk(ensureTimestamps(parsedOk), spec.pk), spec))
    val deduped = if (enableDedup) dedup(hashed) else hashed

    val dropCols = metaColsOut
    val validated = envelope(deduped.filter(col("is_valid")),
      s"validated.$prefix.${spec.name}", dropCols)
    val rejectedSchema = envelope(deduped.filter(!col("is_valid")),
      s"rejected.$prefix.${spec.name}", dropCols)

    val parseBad = base.filter(!col("parse_ok"))
      .select(col("kafka_ts"), col("json_str"))
      // content-addressed key; NULL payloads (tombstones) hash as the
      // empty string so the rejected envelope always has a non-null key
      // (sha2(NULL) would be NULL — unkeyable downstream)
      .withColumn("pk", sha2(coalesce(col("json_str"), lit("")), 256))
      .withColumn("ingested_at", unix_timestamp(col("kafka_ts")).cast("double"))
      .withColumn("evt_ts", to_timestamp(col("kafka_ts")))
      .withColumn("parse_error", lit(true))
    val parseBadRejected = envelope(addPayloadHash(parseBad),
      s"rejected.$prefix.${spec.name}", Seq("pk", "evt_ts", "payload_hash"))

    (validated, Seq(rejectedSchema, parseBadRejected))
  }

  /** U1: N-way unionByName fan-in with empty fallback (VJ:643-653). */
  def unionAll(frames: Seq[DataFrame], spark: org.apache.spark.sql.SparkSession): DataFrame =
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true)).getOrElse {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq("topic", "key", "value").map(StructField(_, StringType))))
    }

  /** ST6: the whole topology — one source, |specs|-way split, two fan-in
    * routes. Works unchanged on batch and streaming frames. */
  def plan(raw: DataFrame, specs: Seq[TopicSpec], prefix: String = "soccer",
           enableDedup: Boolean = false): Routed = {
    val named = topicName(raw, prefix)
    val perTopic = specs.map(planTopic(named, _, prefix, enableDedup))
    val spark = raw.sparkSession
    Routed(
      validated = unionAll(perTopic.map(_._1), spark),
      rejected = unionAll(perTopic.flatMap(_._2), spark))
  }
}
