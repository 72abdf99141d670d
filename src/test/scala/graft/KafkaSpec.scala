package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ValidateRoute
import graft.schema.Schemas
import graft.stream.Kafka

/** Broker-free verification of the Kafka wiring: the subscription regex,
  * the option maps, and the wire↔envelope projections — including that
  * `ValidateRoute.plan` binds to [[Kafka.decode]] output unchanged. */
class KafkaSpec extends AnyFunSuite {
  import TestSpark.spark

  private val ts = Timestamp.valueOf("2024-05-01 12:00:00")
  private def utf8(s: String): Array[Byte] = s.getBytes("UTF-8")

  private val validLeague =
    """{"idLeague":"4328","strLeague":"EPL","strSport":"Soccer","strCountry":"England","ingested_at":1714564800.0}"""
  private val badSport =
    """{"idLeague":"4387","strLeague":"NBA","strSport":"Basketball","strCountry":"USA","ingested_at":1714564800.0}"""

  private def wireDf(rows: Seq[(String, Array[Byte])]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.zipWithIndex.map { case ((topic, value), i) =>
        Row(utf8(s"key$i"), value, topic, 0, i.toLong, ts, 0)
      }),
      Kafka.wireSchema)

  test("topicPattern subscribes prefix topics and excludes own outputs (S1)") {
    val p = Kafka.topicPattern().r
    assert(p.matches("soccer.league"))
    assert(p.matches("soccer.live.event.lookup"))
    assert(!p.matches("validated.soccer.league"))
    assert(!p.matches("rejected.soccer.event"))
    assert(!p.matches("weather.daily"))
    assert(Kafka.topicPattern("iot").r.matches("iot.sensor"))
    assert(!Kafka.topicPattern("iot").r.matches("validated.iot.sensor"))
  }

  test("sourceOptions carries the reference reader config (VJ:540-547)") {
    val opts = Kafka.sourceOptions("broker:9092",
      maxOffsetsPerTrigger = Some(500000), minPartitions = Some(64),
      extra = Map("kafka.security.protocol" -> "SASL_SSL"))
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribePattern") == "^(?!validated\\.|rejected\\.)soccer\\..*")
    assert(opts("startingOffsets") == "earliest")
    assert(opts("failOnDataLoss") == "false")
    assert(opts("maxOffsetsPerTrigger") == "500000")
    assert(opts("minPartitions") == "64")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    // bound-batch knobs absent unless requested
    assert(!Kafka.sourceOptions("b:9092").contains("maxOffsetsPerTrigger"))
  }

  test("sinkOptions carries idempotent produce + checkpoint (VJ:673-680)") {
    val opts = Kafka.sinkOptions("broker:9092", "/chk/validated-all")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("checkpointLocation") == "/chk/validated-all")
    assert(opts("kafka.enable.idempotence") == "true")
  }

  test("decode maps the Kafka wire schema to the envelope contract") {
    val decoded = Kafka.decode(wireDf(Seq(
      "soccer.league" -> utf8(validLeague),
      "soccer.league" -> null))) // tombstone
    assert(decoded.schema.map(f => (f.name, f.dataType)) == Seq(
      "topic" -> StringType, "value" -> StringType, "timestamp" -> TimestampType))
    val byValue = decoded.collect()
    assert(byValue.count(_.isNullAt(1)) == 1) // tombstone stays NULL
    assert(byValue.exists(r => !r.isNullAt(1) && r.getString(1) == validLeague))
  }

  test("ValidateRoute.plan binds to decode output unchanged (S1 end-to-end)") {
    val wire = wireDf(Seq(
      "soccer.league" -> utf8(validLeague),
      "soccer.league" -> utf8(badSport),
      "soccer.league" -> utf8("not json at all"),
      "soccer.league" -> null))
    val routed = ValidateRoute.plan(Kafka.decode(wire), Schemas.specs)
    assert(routed.validated.count() == 1)
    assert(routed.rejected.count() == 3) // bad sport + parse-bad + tombstone
    val vTopics = routed.validated.select("topic").collect().map(_.getString(0))
    assert(vTopics.toSeq == Seq("validated.soccer.league"))
    // the router's own outputs would NOT be re-consumed by the source
    val p = Kafka.topicPattern().r
    assert(!p.matches(vTopics.head))
  }

  test("encode pins the (topic,key,value) string triple (VJ:668-671)") {
    val wire = wireDf(Seq(
      "soccer.league" -> utf8(validLeague),
      "soccer.league" -> utf8(badSport)))
    val routed = ValidateRoute.plan(Kafka.decode(wire), Schemas.specs)
    for (df <- Seq(routed.validated, routed.rejected)) {
      val enc = Kafka.encode(df)
      assert(enc.schema.map(f => (f.name, f.dataType)) == Seq(
        "topic" -> StringType, "key" -> StringType, "value" -> StringType))
    }
    assert(Kafka.encode(routed.validated).count() == 1)
  }

  test("routeWriters configures the two-query kafka topology (S2/ST6)") {
    // a genuinely streaming frame, so writeStream is legal; never started
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-src").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b0.json"),
      s"""{"topic":"soccer.league","value":"{}","timestamp":"2024-05-01T12:00:00.000Z"}""")
    val stream = graft.stream.Streaming.jsonStream(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("topic", StringType),
        org.apache.spark.sql.types.StructField("value", StringType),
        org.apache.spark.sql.types.StructField("timestamp", TimestampType))))
    val routed = ValidateRoute.plan(stream, Schemas.specs)
    val (wv, wr) = Kafka.routeWriters(routed, "broker:9092", "/tmp/chk")
    // construction applies format/options/mode/trigger; .start() needs a
    // broker + connector jar and is deliberately not called here
    assert(wv != null && wr != null)
  }

  test("encode ∘ broker-hop ∘ decode round-trips the envelope (S1+S2)") {
    // the full wire cycle a message takes: router envelope → encode →
    // broker serialization (UTF-8 bytes, broker-assigned timestamp /
    // partition / offset — exactly what a produce+consume does) →
    // decode → the router's own input contract. What the sink writes,
    // the source must re-read unchanged; this is the broker-free
    // equivalent of a produce/consume integration test.
    val wire = wireDf(Seq(
      "soccer.league" -> utf8(validLeague),
      "soccer.league" -> utf8(badSport)))
    val routed = ValidateRoute.plan(Kafka.decode(wire), Schemas.specs)
    val sent = Kafka.encode(routed.validated.unionByName(routed.rejected))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val hop = wireDf(sent.map { case (topic, _, value) =>
      topic -> (if (value == null) null else utf8(value)) })
    val got = Kafka.decode(hop).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1))).toSet
    val want = sent.map { case (topic, _, value) => (topic, value) }.toSet
    assert(got == want, "decode must invert encode across the broker hop")
    assert(want.exists(_._1 == "validated.soccer.league") &&
      want.exists(_._1.startsWith("rejected.")))
    // keys survive the hop as strings too (the producer writes them
    // verbatim; pk-keyed compaction depends on this)
    assert(sent.forall { case (_, key, _) => key != null && key.nonEmpty })
  }
}
