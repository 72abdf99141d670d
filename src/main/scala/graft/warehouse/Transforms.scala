package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Star.{sk, skNullIfZero}

/** The warehouse transform layer — every ClickHouse materialized view and
  * the hub view from the reference DDL
  * (`ClickHouse Data Warehouse Creation + Backfill DDLs.txt`), re-expressed
  * as pure DataFrame transforms over the validated topic frames
  * (string-typed fields per `graft.schema.Schemas`; casts happen here, the
  * warehouse boundary — the reference delegates that coercion to ClickPipes).
  *
  * Streaming ingest = `Streaming.foreachBatchIngest(stream, transform, …)`
  * (MV-on-insert-block semantics, DDL:229-233); backfill = the same
  * function applied to history in batch (DDL:482-613) — one body, two modes.
  *
  * Scale design: dims are narrow projections (no shuffle). Enrichment facts
  * join to a sport-filtered event side — broadcast it (the filtered dim side
  * is small relative to the fact stream). `vFactEventLatest` is one hash
  * aggregate via max_by, not a window sort (see Star.latestPerKey).
  */
object Transforms {

  /** P12: the soccer-only warehouse predicate (DDL:253 et al.). */
  def soccerOnly(df: DataFrame, sportCol: String = "strSport"): DataFrame =
    df.filter(lower(trim(col(sportCol))) === "soccer")

  private def asLong(c: String): Column = col(c).cast("long")

  /** Version stamp for Type-1/latest-per-key semantics. The reference's
    * `now64(3)` works there because ClickHouse stamps per insert block;
    * in a Spark batch `current_timestamp()` is CONSTANT for the whole
    * query, which would make backfilled versions tie and the hub view's
    * max_by nondeterministic. The producer-stamped `ingested_at` is the
    * faithful per-row version; wall-clock is only the fallback. */
  private def stamp: Column =
    coalesce(to_timestamp(from_unixtime(col("ingested_at"))), current_timestamp())

  /** dim_league MV (DDL:236-253). */
  def dimLeague(rawLeague: DataFrame): DataFrame =
    soccerOnly(rawLeague).select(
      sk(asLong("idLeague")).as("league_sk"),
      asLong("idLeague").as("idLeague"),
      col("strLeague"), col("strLeagueAlternate"), col("strSport"),
      col("strCountry"), col("strGender"), col("strCurrentSeason"),
      asLong("intFormedYear").as("intFormedYear"),
      col("strBadge").as("badge_url"),
      col("strLogo").as("logo_url"),
      col("strBanner").as("banner_url"),
      stamp.as("updated_at"))

  /** dim_team MV with flattened league memberships (P19, DDL:256-274). */
  def dimTeam(rawTeam: DataFrame): DataFrame =
    soccerOnly(rawTeam).select(
      sk(asLong("idTeam")).as("team_sk"),
      asLong("idTeam").as("idTeam"),
      col("strTeam"), col("strTeamShort"),
      col("strCountry").as("country"),
      array(asLong("idLeague"), asLong("idLeague2"), asLong("idLeague3"),
        asLong("idLeague4"), asLong("idLeague5"), asLong("idLeague6"),
        asLong("idLeague7")).as("league_ids"),
      col("strStadium"),
      asLong("intStadiumCapacity").as("intStadiumCapacity"),
      asLong("intFormedYear").as("formed_year"),
      col("strWebsite").as("website"),
      col("strBadge").as("badge_url"),
      col("strLogo").as("logo_url"),
      col("strBanner").as("banner_url"),
      stamp.as("updated_at"))

  /** dim_player MV — reads the nested lookup_player doc (DDL:277-292). */
  def dimPlayer(rawPlayer: DataFrame): DataFrame =
    soccerOnly(rawPlayer, "lookup_player.strSport").select(
      sk(asLong("idPlayer")).as("player_sk"),
      asLong("idPlayer").as("idPlayer"),
      asLong("idTeam").as("idTeam"),
      col("lookup_player.strPlayer").as("strPlayer"),
      col("lookup_player.strNumber").as("strNumber"),
      col("lookup_player.strPosition").as("strPosition"),
      col("lookup_player.strNationality").as("nationality"),
      to_date(col("lookup_player.dateBorn")).as("dateBorn"),
      col("lookup_player.strThumb").as("thumb_url"),
      col("lookup_player.strCutout").as("cutout_url"),
      stamp.as("updated_at"))

  /** dim_venue MV (DDL:295-310). */
  def dimVenue(rawVenue: DataFrame): DataFrame =
    soccerOnly(rawVenue).select(
      sk(asLong("idVenue")).as("venue_sk"),
      asLong("idVenue").as("idVenue"),
      col("strVenue"), col("strLocation"), col("strCountry"),
      asLong("intCapacity").as("intCapacity"),
      col("strTimezone"),
      col("strThumb").as("thumb_url"),
      col("strLogo").as("logo_url"),
      col("strMap").as("map_url"),
      stamp.as("updated_at"))

  /** dim_channel MV — A7 last-value-per-group with the idChannel!=0 guard
    * (DDL:313-324). The reference's `anyLast` is order-dependent; we use
    * `max_by(_, ingested_at)` — deterministic latest-by-ingest. */
  def dimChannel(rawBroadcast: DataFrame): DataFrame =
    soccerOnly(rawBroadcast)
      .filter(asLong("idChannel") =!= 0)
      .groupBy(asLong("idChannel").as("idChannel"))
      .agg(
        max_by(col("strChannel"), col("ingested_at")).as("strChannel"),
        max_by(col("strCountry"), col("ingested_at")).as("strCountry"),
        max_by(col("strLogo"), col("ingested_at")).as("strLogo"),
        max(col("ingested_at")).as("ingested_at"))
      .select(
        sk(col("idChannel")).as("channel_sk"),
        col("idChannel"), col("strChannel"), col("strCountry"), col("strLogo"),
        stamp.as("updated_at"))

  /** fact_event MV — P13/P14/P15 composed (DDL:329-349). */
  def factEvent(rawEvent: DataFrame): DataFrame =
    soccerOnly(rawEvent).select(
      asLong("idEvent").as("idEvent"),
      sk(asLong("idLeague")).as("league_sk"),
      sk(asLong("idHomeTeam")).as("home_team_sk"),
      sk(asLong("idAwayTeam")).as("away_team_sk"),
      skNullIfZero(asLong("idVenue")).as("venue_sk"),
      col("strSeason").as("season"),
      asLong("intRound").as("round"),
      col("strStatus").as("status_final"),
      col("strResult").as("result"),
      col("strEvent"),
      to_date(col("dateEvent")).as("event_date"),
      coalesce(to_timestamp(col("strTimestamp")), to_timestamp(col("dateEvent")))
        .as("scheduled_utc"),
      lit(null).cast("timestamp").as("kickoff_local_utc"),
      asLong("intHomeScore").as("home_score"),
      asLong("intAwayScore").as("away_score"),
      col("strThumb").as("thumb_url"),
      stamp.as("created_at"),
      stamp.as("updated_at"))

  /** fact_event_snapshot MV — P18 null-guarded total (DDL:354-366). */
  def factEventSnapshot(rawLivescore: DataFrame): DataFrame = {
    val h = asLong("intHomeScore")
    val a = asLong("intAwayScore")
    soccerOnly(rawLivescore).select(
      asLong("idEvent").as("idEvent"),
      to_timestamp(col("updated")).as("snapshot_ts"),
      sk(asLong("idLeague")).as("league_sk"),
      sk(asLong("idHomeTeam")).as("home_team_sk"),
      sk(asLong("idAwayTeam")).as("away_team_sk"),
      col("strStatus").as("status"),
      asLong("strProgress").as("progress"),
      h.as("home_score"),
      a.as("away_score"),
      when(h.isNull || a.isNull, lit(null)).otherwise(h + a).as("total_score"))
  }

  /** J1: enrichment join — the fact stream joined to the soccer-filtered
    * event side to inherit the sport predicate. The event side is
    * broadcast: post-filter it is dimension-sized, so no shuffle of the
    * (much larger) fact stream (DDL:369-379). */
  private def joinEventSport(factSide: DataFrame, rawEvent: DataFrame): DataFrame = {
    val events = soccerOnly(rawEvent)
      .select(asLong("idEvent").as("idEvent")).distinct()
    factSide.withColumn("idEvent", asLong("idEvent"))
      .join(broadcast(events), "idEvent")
  }

  /** fact_event_stat MV (DDL:369-379). */
  def factEventStat(rawStats: DataFrame, rawEvent: DataFrame): DataFrame =
    joinEventSport(rawStats, rawEvent).select(
      col("idEvent"),
      col("strStat").as("stat_code"),
      asLong("intHome").as("home_value"),
      asLong("intAway").as("away_value"),
      stamp.as("asof_ts"))

  /** fact_timeline MV — P14 zero-key nullification ×3 (DDL:382-398). */
  def factTimeline(rawTimeline: DataFrame, rawEvent: DataFrame): DataFrame =
    joinEventSport(rawTimeline, rawEvent).select(
      asLong("idTimeline").as("idTimeline"),
      col("idEvent"),
      asLong("intTime").as("minute"),
      col("strTimeline").as("timeline_type"),
      col("strTimelineDetail").as("detail"),
      skNullIfZero(asLong("idTeam")).as("team_sk"),
      skNullIfZero(asLong("idPlayer")).as("player_sk"),
      skNullIfZero(asLong("idAssist")).as("assist_player_sk"),
      col("strComment").as("comment"),
      to_date(col("dateEvent")).as("event_date"),
      stamp.as("asof_ts"))

  /** fact_lineup MV — P17 yes/no flag (DDL:401-414). */
  def factLineup(rawLineup: DataFrame, rawEvent: DataFrame): DataFrame =
    joinEventSport(rawLineup, rawEvent).select(
      col("idEvent"),
      sk(asLong("idTeam")).as("team_sk"),
      sk(asLong("idPlayer")).as("player_sk"),
      col("strPosition").as("position"),
      col("strPositionShort").as("position_short"),
      when(lower(trim(col("strSubstitute"))) === "yes", 1).otherwise(0)
        .as("is_substitute"),
      asLong("intSquadNumber").as("squad_number"),
      stamp.as("asof_ts"))

  /** fact_broadcast MV (DDL:417-426). */
  def factBroadcast(rawBroadcast: DataFrame): DataFrame =
    soccerOnly(rawBroadcast).select(
      asLong("idEvent").as("idEvent"),
      sk(asLong("idChannel")).as("channel_sk"),
      col("strEventCountry").as("country"),
      to_date(col("dateEvent")).as("event_date"),
      stamp.as("asof_ts"))

  /** fact_highlight MV — P16 first-non-empty media classifier (DDL:429-439). */
  def factHighlight(rawHighlights: DataFrame): DataFrame =
    soccerOnly(rawHighlights).select(
      asLong("idEvent").as("idEvent"),
      when(col("strVideo").isNotNull && col("strVideo") =!= "", "video")
        .when(col("strThumb").isNotNull && col("strThumb") =!= "", "thumb")
        .when(col("strBanner").isNotNull && col("strBanner") =!= "", "banner")
        .otherwise("asset").as("media_type"),
      coalesce(col("strVideo"), col("strThumb"), col("strBanner"), lit(""))
        .as("url"),
      stamp.as("asof_ts"))

  /** A8: the argMax hub view — current state per event (DDL:447-470).
    * One max_by over the packed payload struct + the two max() stamps:
    * a single hash aggregate instead of 15 argMax states or a window sort. */
  def vFactEventLatest(factEvent: DataFrame): DataFrame = {
    val payload = factEvent.columns.filterNot(Set("idEvent", "updated_at", "created_at")).toSeq
    factEvent.groupBy(col("idEvent"))
      .agg(
        max_by(struct(payload.map(col): _*), col("updated_at")).as("_latest"),
        max(col("updated_at")).as("updated_at_latest"),
        max(col("created_at")).as("created_at_latest"))
      .select(
        Seq(col("idEvent")) ++
        payload.map(c => col(s"_latest.$c").as(c)) ++
        Seq(to_date(col("_latest.scheduled_utc")).as("scheduled_date"),
          col("updated_at_latest"), col("created_at_latest")): _*)
  }

  /** O4/P20: monthly-partitioned, sort-keyed fact writer — the Spark analog
    * of `PARTITION BY toYYYYMM(…) ORDER BY (…)` (DDL:143-146). Partition
    * pruning replaces ClickHouse partition elimination; the within-partition
    * sort feeds parquet row-group min/max skipping. */
  def writeMonthly(df: DataFrame, tsCol: String, sortCols: Seq[String], path: String): Unit =
    df.withColumn("part_month", date_format(col(tsCol), "yyyyMM"))
      .repartition(col("part_month"))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("append").partitionBy("part_month").parquet(path)
}
