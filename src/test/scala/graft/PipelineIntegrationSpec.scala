package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ValidateRoute
import graft.olap.Quality
import graft.schema.Schemas
import graft.warehouse.{Star, Transforms}

/** End-to-end: the complete reference pipeline composed from this
  * engine's parts — Kafka-shaped messages → validate/route → warehouse
  * transforms (dims + facts) → argMax hub view → dead-letter OLAP on the
  * rejected route. What `VJ` + ClickPipes + `DDL` + `NB` do across four
  * systems, in one audited Spark lineage.
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-05-01 12:00:00")

  private def messages: DataFrame = Seq(
    // league: 1 valid, 1 wrong sport
    "soccer.league" ->
      """{"idLeague":"4328","strLeague":"EPL","strSport":"Soccer","strCountry":"England","ingested_at":1714564800.0}""",
    "soccer.league" ->
      """{"idLeague":"4387","strLeague":"NBA","strSport":"Basketball","strCountry":"USA","ingested_at":1714564800.0}""",
    // event: two VERSIONS of the same event (NS then FT) + one other event
    "soccer.event" ->
      """{"idEvent":"7","idLeague":"4328","idHomeTeam":"1","idAwayTeam":"2","idVenue":"9",
        |"strSport":"Soccer","strStatus":"NS","dateEvent":"2024-05-01","strSeason":"2024","ingested_at":1714564800.0}""",
    "soccer.event" ->
      """{"idEvent":"7","idLeague":"4328","idHomeTeam":"1","idAwayTeam":"2","idVenue":"9",
        |"strSport":"Soccer","strStatus":"FT","intHomeScore":"3","intAwayScore":"1",
        |"dateEvent":"2024-05-01","strSeason":"2024","ingested_at":1714600000.0}""",
    "soccer.event" ->
      """{"idEvent":"8","idLeague":"4328","idHomeTeam":"2","idAwayTeam":"3","idVenue":"0",
        |"strSport":"Soccer","strStatus":"NS","dateEvent":"2024-05-02","strSeason":"2024","ingested_at":1714564800.0}""",
    // stats for event 7 (no sport field — validated via event join later)
    "soccer.event.stats" ->
      """{"idEvent":"7","idStatistic":"1","strStat":"Shots","intHome":"12","intAway":"8","ingested_at":1714564800.0}""",
    // garbage
    "soccer.event" -> "NOT JSON {{{")
    .map { case (t, v) => (t, v.stripMargin.replaceAll("\n", "")) }
    .toDF("topic", "value").withColumn("timestamp", lit(ts))

  private lazy val routed = ValidateRoute.plan(messages, Schemas.specs)

  /** Validated envelope rows → the raw staging shape for one topic
    * (the ClickPipes role: topic JSON → typed staging table). */
  private def staging(topic: String): DataFrame =
    routed.validated
      .filter(col("topic") === s"validated.soccer.$topic")
      .select(from_json(col("value"), Schemas.byName(topic).schema).as("d"))
      .select("d.*")

  test("routes split correctly at the front door") {
    assert(routed.validated.count() == 5) // league + 3 events + stats
    assert(routed.rejected.count() == 2)  // NBA league + parse failure
  }

  test("warehouse builds from the validated routes and the hub view collapses versions") {
    val dimLeague = Transforms.dimLeague(staging("league"))
    assert(dimLeague.count() == 1)

    val factEvent = Transforms.factEvent(staging("event"))
    assert(factEvent.count() == 3) // two versions of 7 + one of 8

    // updated_at derives from producer-stamped ingested_at, so versions
    // arriving in ONE batch (backfill) still order deterministically
    val hub = Transforms.vFactEventLatest(factEvent)
    assert(hub.count() == 2)
    val e7 = hub.filter(col("idEvent") === 7L).head
    assert(e7.getAs[String]("status_final") == "FT")
    assert(e7.getAs[Long]("home_score") == 3L)
    // event 8 has venue id 0 → NULL venue_sk (P14) survives to the hub
    val e8 = hub.filter(col("idEvent") === 8L).head
    assert(e8.isNullAt(hub.columns.indexOf("venue_sk")))
  }

  test("enrichment facts inherit the sport predicate through the event join") {
    val stats = Transforms.factEventStat(staging("event.stats"), staging("event"))
    assert(stats.count() == 1)
    assert(stats.head.getAs[Long]("home_value") == 12L)
  }

  test("dead-letter analytics run on the rejected route") {
    // the rejected envelope is the consume_kafka.py parquet shape:
    // (topic, event_time, message)
    val deadLetter = routed.rejected.select(
      col("topic"), lit(ts).cast("string").as("event_time"), col("value").as("message"))
    val counts = deadLetter.groupBy("topic").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map(
      "rejected.soccer.league" -> 1L, "rejected.soccer.event" -> 1L))
    // keyword classing (NB q3 shape) works on the message payload
    val basketball = deadLetter
      .filter(lower(col("message")).contains("basketball")).count()
    assert(basketball == 1L)
  }

  test("flagship entry composes the same kernel on the fixtures") {
    val e = SparkEntry.entry(spark)
    assert(e.count() > 0)
  }
}
