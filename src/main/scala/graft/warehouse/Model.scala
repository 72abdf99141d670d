package graft.warehouse

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed models for the warehouse layer (SURVEY §1.2: `Dataset[T]` where
  * type safety pays — the dims and the hub-facing fact). The untyped
  * transforms stay the primary path (schema-driven, no Encoder overhead in
  * shuffles); these views give library users compile-time field checks at
  * the API boundary.
  */
object Model {

  final case class DimLeague(
      league_sk: Long, idLeague: Long, strLeague: Option[String],
      strLeagueAlternate: Option[String], strSport: Option[String],
      strCountry: Option[String], strGender: Option[String],
      strCurrentSeason: Option[String], intFormedYear: Option[Long],
      badge_url: Option[String], logo_url: Option[String],
      banner_url: Option[String], updated_at: Timestamp)

  final case class DimChannel(
      channel_sk: Long, idChannel: Long, strChannel: Option[String],
      strCountry: Option[String], strLogo: Option[String], updated_at: Timestamp)

  final case class FactEvent(
      idEvent: Long, league_sk: Long, home_team_sk: Long, away_team_sk: Long,
      venue_sk: Option[Long], season: Option[String], round: Option[Long],
      status_final: Option[String], result: Option[String],
      strEvent: Option[String], event_date: Option[Date],
      scheduled_utc: Option[Timestamp], kickoff_local_utc: Option[Timestamp],
      home_score: Option[Long], away_score: Option[Long],
      thumb_url: Option[String], created_at: Timestamp, updated_at: Timestamp)

  def dimLeague(df: DataFrame): Dataset[DimLeague] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[DimLeague]
  }

  def dimChannel(df: DataFrame): Dataset[DimChannel] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[DimChannel]
  }

  def factEvent(df: DataFrame): Dataset[FactEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[FactEvent]
  }
}
