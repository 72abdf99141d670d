package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{Schemas, TopicSpec}
import graft.warehouse.Transforms

class TransformsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Build a raw topic frame by parsing JSON docs against the declared
    * schema — the same path production rows take. */
  private def rawFrom(spec: TopicSpec, jsons: String*): DataFrame =
    jsons.toSeq.toDF("json")
      .select(from_json(col("json"), spec.schema).as("d"))
      .select("d.*")

  test("dimLeague filters sport, casts keys, stamps updated_at (P12/P13)") {
    val raw = rawFrom(Schemas.byName("league"),
      """{"idLeague":"4328","strLeague":"EPL","strSport":" Soccer ","strCountry":"England"}""",
      """{"idLeague":"4387","strLeague":"NBA","strSport":"Basketball","strCountry":"USA"}""",
      """{"idLeague":"1","strLeague":"X","strSport":null}""")
    val dim = Transforms.dimLeague(raw)
    val rows = dim.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("idLeague") == 4328L)
    assert(!rows.head.isNullAt(dim.columns.indexOf("league_sk")))
  }

  test("dimTeam flattens the 7 league memberships into an array (P19)") {
    val raw = rawFrom(Schemas.byName("team"),
      """{"idTeam":"133604","strTeam":"Arsenal","strSport":"Soccer","idLeague":"4328","idLeague2":"4482"}""")
    val ids = Transforms.dimTeam(raw).select("league_ids").head.getSeq[Any](0)
    assert(ids.length == 7)
    assert(ids.head == 4328L && ids(1) == 4482L && ids(2) == null)
  }

  test("dimPlayer reads nested lookup_player fields and sport (P6 nested)") {
    val raw = rawFrom(Schemas.byName("player"),
      """{"idPlayer":"1","idTeam":"2","lookup_player":{"strPlayer":"Kane","strSport":"Soccer","dateBorn":"1993-07-28","strPosition":"Forward"}}""",
      """{"idPlayer":"3","idTeam":"4","lookup_player":{"strPlayer":"Lee","strSport":"Darts"}}""")
    val dim = Transforms.dimPlayer(raw)
    assert(dim.count() == 1)
    val r = dim.head
    assert(r.getAs[String]("strPlayer") == "Kane")
    assert(r.getAs[java.sql.Date]("dateBorn").toString == "1993-07-28")
  }

  test("dimChannel dedupes by channel, guards zero ids, keeps latest (A7)") {
    val raw = rawFrom(Schemas.byName("broadcast"),
      """{"id":"1","idChannel":"10","strChannel":"Old Name","strSport":"Soccer","ingested_at":100.0}""",
      """{"id":"2","idChannel":"10","strChannel":"New Name","strSport":"Soccer","ingested_at":200.0}""",
      """{"id":"3","idChannel":"0","strChannel":"Ghost","strSport":"Soccer","ingested_at":300.0}""",
      """{"id":"4","idChannel":"11","strChannel":"Hoops","strSport":"Basketball","ingested_at":400.0}""")
    val dim = Transforms.dimChannel(raw)
    val rows = dim.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("idChannel") == 10L)
    assert(rows.head.getAs[String]("strChannel") == "New Name")
  }

  test("factEvent: venue zero-key → NULL sk; scheduled_utc falls back to dateEvent (P14/P15)") {
    val raw = rawFrom(Schemas.byName("event"),
      """{"idEvent":"7","idLeague":"1","idHomeTeam":"2","idAwayTeam":"3","idVenue":"0",
        |"strSport":"Soccer","dateEvent":"2024-05-01","strStatus":"FT"}""".stripMargin.replaceAll("\n", ""),
      """{"idEvent":"8","idLeague":"1","idHomeTeam":"2","idAwayTeam":"3","idVenue":"99",
        |"strSport":"Soccer","dateEvent":"2024-05-02","strTimestamp":"2024-05-02 18:30:00"}""".stripMargin.replaceAll("\n", ""))
    val fe = Transforms.factEvent(raw).orderBy("idEvent").collect()
    assert(fe(0).isNullAt(Transforms.factEvent(raw).columns.indexOf("venue_sk")))
    assert(!fe(1).isNullAt(Transforms.factEvent(raw).columns.indexOf("venue_sk")))
    assert(fe(0).getAs[java.sql.Timestamp]("scheduled_utc").toString.startsWith("2024-05-01"))
    assert(fe(1).getAs[java.sql.Timestamp]("scheduled_utc").toString.startsWith("2024-05-02 18:30"))
  }

  test("factEventSnapshot: total_score null-propagates explicitly (P18)") {
    val raw = rawFrom(Schemas.byName("live_score"),
      """{"idLiveScore":"1","idEvent":"7","idLeague":"1","idHomeTeam":"2","idAwayTeam":"3",
        |"intHomeScore":"2","intAwayScore":"1","strSport":"Soccer","updated":"2024-05-01 20:00:00"}""".stripMargin.replaceAll("\n", ""),
      """{"idLiveScore":"2","idEvent":"7","idLeague":"1","idHomeTeam":"2","idAwayTeam":"3",
        |"intHomeScore":"2","strSport":"Soccer","updated":"2024-05-01 20:05:00"}""".stripMargin.replaceAll("\n", ""))
    val fs = Transforms.factEventSnapshot(raw).orderBy("snapshot_ts")
    val rows = fs.collect()
    assert(rows(0).getAs[Long]("total_score") == 3L)
    assert(rows(1).isNullAt(fs.columns.indexOf("total_score")))
  }

  test("factEventStat inherits the sport predicate through the event join (J1)") {
    val stats = rawFrom(Schemas.byName("event.stats"),
      """{"idEvent":"7","idStatistic":"1","strStat":"Shots","intHome":"12","intAway":"8"}""",
      """{"idEvent":"9","idStatistic":"1","strStat":"Shots","intHome":"3","intAway":"4"}""")
    val events = rawFrom(Schemas.byName("event"),
      """{"idEvent":"7","strSport":"Soccer"}""",
      """{"idEvent":"9","strSport":"Basketball"}""")
    val fs = Transforms.factEventStat(stats, events)
    assert(fs.select("idEvent").as[Long].collect().toSeq == Seq(7L))
    assert(fs.head.getAs[Long]("home_value") == 12L)
  }

  test("factLineup maps yes/no substitute flag (P17)") {
    val lineup = rawFrom(Schemas.byName("event.lineup"),
      """{"idLineup":"1","idEvent":"7","idTeam":"2","idPlayer":"5","strPosition":"GK","strSubstitute":" Yes "}""",
      """{"idLineup":"2","idEvent":"7","idTeam":"2","idPlayer":"6","strPosition":"CB","strSubstitute":"No"}""")
    val events = rawFrom(Schemas.byName("event"), """{"idEvent":"7","strSport":"Soccer"}""")
    val got = Transforms.factLineup(lineup, events)
      .orderBy("player_sk").select("is_substitute").as[Int].collect().toSet
    assert(got == Set(0, 1))
  }

  test("factHighlight classifies media by first non-empty url (P16)") {
    val raw = rawFrom(Schemas.byName("event.highlights"),
      """{"idEvent":"1","strSport":"Soccer","strVideo":"v.mp4","strThumb":"t.jpg"}""",
      """{"idEvent":"2","strSport":"Soccer","strVideo":"","strThumb":"t2.jpg"}""",
      """{"idEvent":"3","strSport":"Soccer","strBanner":"b.png"}""",
      """{"idEvent":"4","strSport":"Soccer"}""")
    val got = Transforms.factHighlight(raw).orderBy("idEvent")
      .select("media_type", "url").as[(String, String)].collect().toSeq
    // Reference quirk preserved (DDL:433-437): the classifier skips EMPTY
    // urls but the url coalesce only skips NULL ones — an empty strVideo
    // yields media_type='thumb' with url='' exactly as ClickHouse does.
    assert(got == Seq(("video", "v.mp4"), ("thumb", ""), ("banner", "b.png"), ("asset", "")))
  }

  test("typed Dataset views compile-check the warehouse contract (§1.2)") {
    val raw = rawFrom(Schemas.byName("league"),
      """{"idLeague":"4328","strLeague":"EPL","strSport":"Soccer","strCountry":"England"}""")
    val ds = graft.warehouse.Model.dimLeague(Transforms.dimLeague(raw))
    val row = ds.head()
    assert(row.idLeague == 4328L && row.strLeague.contains("EPL"))

    val rawE = rawFrom(Schemas.byName("event"),
      """{"idEvent":"7","idLeague":"1","idHomeTeam":"2","idAwayTeam":"3","idVenue":"0",
        |"strSport":"Soccer","dateEvent":"2024-05-01","strStatus":"FT"}""".stripMargin.replaceAll("\n", ""))
    val fe = graft.warehouse.Model.factEvent(Transforms.factEvent(rawE)).head()
    assert(fe.idEvent == 7L && fe.venue_sk.isEmpty && fe.status_final.contains("FT"))
  }

  test("vFactEventLatest collapses versions to current state (A8)") {
    val fe = Seq(
      (7L, "NS", null.asInstanceOf[java.lang.Long], "2024-05-01 10:00:00", "2024-05-01 09:00:00"),
      (7L, "FT", java.lang.Long.valueOf(3L), "2024-05-01 22:00:00", "2024-05-01 09:30:00"),
      (8L, "NS", null.asInstanceOf[java.lang.Long], "2024-05-02 10:00:00", "2024-05-02 10:00:00"))
      .toDF("idEvent", "status_final", "home_score", "updated_at", "created_at")
      .withColumn("updated_at", to_timestamp(col("updated_at")))
      .withColumn("created_at", to_timestamp(col("created_at")))
      .withColumn("scheduled_utc", to_timestamp(lit("2024-05-01 18:00:00")))
    val hub = Transforms.vFactEventLatest(fe).orderBy("idEvent")
    val rows = hub.collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("status_final") == "FT")
    assert(rows(0).getAs[Long]("home_score") == 3L)
    assert(rows(0).getAs[java.sql.Timestamp]("updated_at_latest").toString.startsWith("2024-05-01 22:00"))
    assert(rows(0).getAs[java.sql.Date]("scheduled_date").toString == "2024-05-01")
  }
}
