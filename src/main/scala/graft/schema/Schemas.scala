package graft.schema

import org.apache.spark.sql.types._

/** Per-topic message contract: declared schema (never inferred), primary-key
  * columns, required columns, and the (possibly nested) sport-field path plus
  * the pattern that must match it for a row to be valid.
  *
  * Mirrors the reference's four config maps: schemas
  * (`spark/jobs/validate_json.py:87-494`), `primary` (`:53-67`), `required`
  * (`:497-515`), `SPORT_FIELD_MAP` (`:518-530`). The sport pattern is
  * generalized to a parameter so the same pipeline validates any keyed JSON
  * stream (the fixture `events` stream uses its own spec in tests).
  */
final case class TopicSpec(
    name: String,
    schema: StructType,
    pk: Seq[String],
    required: Seq[String],
    sportField: Option[String],
    sportPattern: String = "(?i)soccer")

object Schemas {

  /** All API fields arrive as strings (numerics included); producers stamp
    * `ingested_at` as epoch-seconds double (reference VJ:88-494). */
  private def topicSchema(fields: String*): StructType =
    StructType(fields.map(f => StructField(f, StringType)) :+
      StructField("ingested_at", DoubleType))

  private val broadcastFields = Seq("id", "idEvent", "intDivision", "idChannel",
    "strChannel", "strCountry", "strEventCountry", "strSport", "strEvent",
    "strSeason", "dateEvent", "strTime", "strTimeStamp", "strLogo",
    "strEventThumb", "strEventPoster", "strEventBanner", "strEventSquare")

  private val eventFields = Seq("idEvent", "idLeague", "idHomeTeam", "idAwayTeam",
    "idVenue", "strVenue", "strEvent", "strSeason", "strCountry", "strCity",
    "strSport", "strDescriptionEN", "strHomeTeam", "strAwayTeam", "intHomeScore",
    "intAwayScore", "intRound", "intSpectators", "intScore", "intScoreVotes",
    "strResult", "strGroup", "strOfficial", "strPoster", "strSquare", "strThumb",
    "strBanner", "strMap", "strTweet1", "strStatus", "dateEvent", "strEventTime",
    "strTimestamp", "strTime", "strHomeTeamBadge", "strAwayTeamBadge", "strFilename")

  private val teamFields = Seq("idTeam", "idESPN", "idVenue", "idLeague",
    "idLeague2", "idLeague3", "idLeague4", "idLeague5", "idLeague6", "idLeague7",
    "strLeague", "strLeague2", "strLeague3", "strLeague4", "strLeague5",
    "strLeague6", "strLeague7", "strDivision", "intFormedYear", "strTeam",
    "strTeamAlternate", "strTeamShort", "strSport", "strStadium",
    "intStadiumCapacity", "strLocation", "strCountry", "strKeywords", "strRSS",
    "strDescriptionEN", "strColour1", "strColour2", "strColour3", "strEquipment",
    "strGender", "strWebsite", "strBadge", "strLogo", "strFanart1", "strFanart2",
    "strFanart3", "strFanart4", "strBanner")

  private val liveEventLookupFields = Seq("idEvent", "idAPIfootball", "strEvent",
    "strEventAlternate", "strFilename", "strSport", "idLeague", "strLeague",
    "strLeagueBadge", "strSeason", "strDescriptionEN", "strHomeTeam",
    "strAwayTeam", "intHomeScore", "intRound", "intAwayScore", "intSpectators",
    "strOfficial", "strTimestamp", "dateEvent", "dateEventLocal", "strTime",
    "strTimeLocal", "strGroup", "idHomeTeam", "strHomeTeamBadge", "idAwayTeam",
    "strAwayTeamBadge", "intScore", "intScoreVotes", "strResult", "idVenue",
    "strVenue", "strCountry", "strCity", "strPoster", "strSquare", "strFanart",
    "strThumb", "strBanner", "strMap", "strTweet1", "strTweet2", "strTweet3",
    "strVideo", "strStatus", "strPostponed", "strLocked")

  private val leagueFields = Seq("idLeague", "idAPIfootball", "idSoccerXML",
    "idCup", "intDivision", "strCurrentSeason", "intFormedYear", "strGender",
    "strTvRights", "strLeague", "strSport", "strLeagueAlternate", "strCountry",
    "strDescriptionEN", "strFanart1", "strFanart2", "strFanart3", "strBanner",
    "strBadge", "strLogo", "strPoster", "strTrophy", "strNaming", "strWebsite",
    "strFacebook", "strRSS")

  private val venueFields = Seq("idVenue", "idDupe", "intFormedYear", "strCost",
    "strArchitect", "strVenueSponsor", "strVenueAlternate", "strVenue",
    "strSport", "strLocation", "strCountry", "intCapacity", "strDescriptionEN",
    "strFanart1", "strFanart2", "strFanart3", "strThumb", "strLogo", "strMap",
    "strWebsite", "strCreativeCommons", "strTimezone")

  private val scheduleFields = Seq("idEvent", "idHomeTeam", "idAwayTeam",
    "strEvent", "strSport", "strHomeTeam", "strAwayTeam", "intHomeScore",
    "intAwayScore", "strStatus", "strCountry", "strVenue", "strThumb",
    "strHomeTeamBadge", "strAwayTeamBadge", "strTimeLocal", "strTime",
    "strTimestamp", "dateEvent")

  private val liveScoreFields = Seq("idLiveScore", "idEvent", "idLeague",
    "idHomeTeam", "idAwayTeam", "intHomeScore", "intAwayScore", "strLeague",
    "strHomeTeam", "strAwayTeam", "strStatus", "strSport", "strEventTime",
    "dateEvent", "strHomeTeamBadge", "strAwayTeamBadge", "intEventScore",
    "intEventScoreTotal", "strProgress", "updated")

  private val eventStatsFields = Seq("idEvent", "idStatistic", "idApiFootball",
    "strEvent", "strStat", "intHome", "intAway")

  private val eventTimelineFields = Seq("idTimeline", "idEvent", "strTimeline",
    "strTimelineDetail", "strHome", "strEvent", "idAPIfootball", "idPlayer",
    "strPlayer", "strCountry", "idAssist", "strAssist", "intTime", "idTeam",
    "strTeam", "strComment", "dateEvent", "strSeason")

  private val eventHighlightsFields = Seq("idEvent", "idAPIfootball",
    "idHomeTeam", "idAwayTeam", "idVenue", "strEvent", "strEventAlternate",
    "strFilename", "strSport", "idLeague", "strLeague", "strLeagueBadge",
    "strSeason", "strDescriptionEN", "strHomeTeam", "strAwayTeam",
    "intHomeScore", "intAwayScore", "intRound", "intScore", "intScoreVotes",
    "strResult", "strOfficial", "strGroup", "strHomeTeamBadge",
    "strAwayTeamBadge", "strCountry", "strPoster", "strSquare", "strFanart",
    "strThumb", "strBanner", "strMap", "strTweet1", "strTweet2", "strTweet3",
    "strVideo", "dateEvent", "strTime", "strStatus", "strPostponed", "strLocked")

  private val eventLineupFields = Seq("idLineup", "idEvent", "strEvent",
    "strPosition", "strPositionShort", "strHome", "strSubstitute",
    "intSquadNumber", "strCutout", "idPlayer", "strPlayer", "idTeam", "strTeam",
    "strSeason", "strCountry")

  private val lookupPlayerFields = Seq("idTeam2", "idTeamNational",
    "idAPIfootball", "idPlayerManager", "idWikidata", "idTransferMkt", "idESPN",
    "intSoccerXMLTeamID", "strNationality", "strPlayer", "strPlayerAlternate",
    "strSport", "dateBorn", "dateDied", "dateSigned", "strSigning", "strWage",
    "strOutfitter", "strKit", "strAgent", "strBirthLocation", "strEthnicity",
    "strGender", "strSide", "strCollege", "strFacebook", "strWebsite",
    "strTwitter", "strInstagram", "strYoutube", "strThumb", "strPoster",
    "strCutout", "strRender", "strBanner", "strFanart1", "strFanart2",
    "strFanart3", "strFanart4", "strCreativeCommons", "strNumber",
    "strPosition", "strStatus", "strHeight", "strWeight", "strTeam", "strTeam2",
    "strDescriptionEN")

  /** `player` carries a 48-field nested doc (VJ:442-491); the sport filter
    * reads the nested path `lookup_player.strSport` (VJ:528). */
  private val playerSchema: StructType = StructType(Seq(
    StructField("idPlayer", StringType),
    StructField("idTeam", StringType),
    StructField("lookup_player",
      StructType(lookupPlayerFields.map(f => StructField(f, StringType)))),
    StructField("ingested_at", DoubleType)))

  val specs: Seq[TopicSpec] = Seq(
    TopicSpec("broadcast", topicSchema(broadcastFields: _*),
      pk = Seq("id", "strTimeStamp"),
      required = Seq("id", "idEvent", "strSport", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("event", topicSchema(eventFields: _*),
      pk = Seq("idEvent"),
      required = Seq("idEvent", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("team", topicSchema(teamFields: _*),
      pk = Seq("idTeam"),
      required = Seq("idTeam", "strTeam", "strSport", "idLeague", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("league", topicSchema(leagueFields: _*),
      pk = Seq("idLeague"),
      required = Seq("idLeague", "strLeague", "strSport", "strCountry", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("venue", topicSchema(venueFields: _*),
      pk = Seq("idVenue"),
      required = Seq("idVenue", "strVenue", "strSport", "strLocation", "strCountry", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("schedule", topicSchema(scheduleFields: _*),
      pk = Seq("idEvent", "strTimestamp"),
      required = Seq("idEvent", "strEvent", "strSport", "idHomeTeam", "idAwayTeam",
        "strTimestamp", "dateEvent", "strStatus", "strCountry", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("live_score", topicSchema(liveScoreFields: _*),
      pk = Seq("idLiveScore"),
      required = Seq("idLiveScore", "idEvent", "strSport", "idLeague", "idHomeTeam",
        "idAwayTeam", "intHomeScore", "intAwayScore", "strStatus",
        "strEventTime", "dateEvent", "updated", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("live.event.lookup", topicSchema(liveEventLookupFields: _*),
      pk = Seq("idEvent"),
      required = Seq("idEvent", "strSport", "idLeague", "idHomeTeam", "idAwayTeam",
        "strStatus", "strTimestamp", "dateEvent", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("event.stats", topicSchema(eventStatsFields: _*),
      pk = Seq("idEvent", "idStatistic"),
      required = Seq("idEvent", "idStatistic", "strStat", "intHome", "intAway", "ingested_at"),
      sportField = None),
    TopicSpec("event.timeline", topicSchema(eventTimelineFields: _*),
      pk = Seq("idTimeline"),
      required = Seq("idTimeline", "idEvent", "strTimeline", "idPlayer", "ingested_at"),
      sportField = None),
    TopicSpec("event.highlights", topicSchema(eventHighlightsFields: _*),
      pk = Seq("idEvent", "strFilename"),
      required = Seq("idEvent", "idAPIfootball", "strEvent", "intHomeScore",
        "intAwayScore", "ingested_at"),
      sportField = Some("strSport")),
    TopicSpec("event.lineup", topicSchema(eventLineupFields: _*),
      pk = Seq("idLineup"),
      required = Seq("idLineup", "idEvent", "strPosition", "idPlayer", "ingested_at"),
      sportField = None),
    TopicSpec("player", playerSchema,
      pk = Seq("idPlayer"),
      required = Seq("idPlayer", "idTeam", "lookup_player", "ingested_at"),
      sportField = Some("lookup_player.strSport")),
  )

  val byName: Map[String, TopicSpec] = specs.map(s => s.name -> s).toMap
}
