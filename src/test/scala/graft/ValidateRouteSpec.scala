package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ValidateRoute
import graft.schema.Schemas

class ValidateRouteSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val ts = Timestamp.valueOf("2024-05-01 12:00:00")

  private def raw(rows: (String, String)*): DataFrame =
    rows.toSeq.toDF("topic", "value").withColumn("timestamp", lit(ts))

  private val validLeague =
    """{"idLeague":"4328","strLeague":"English Premier League","strSport":"Soccer",
      |"strCountry":"England","ingested_at":1714564800.0}""".stripMargin.replaceAll("\n", "")
  private val basketballLeague =
    """{"idLeague":"4387","strLeague":"NBA","strSport":"Basketball",
      |"strCountry":"USA","ingested_at":1714564800.0}""".stripMargin.replaceAll("\n", "")
  private val nullRequiredLeague =
    """{"idLeague":"9999","strSport":"Soccer","ingested_at":1714564800.0}"""
  private val notJson = "this is { not json"
  private val validPlayer =
    """{"idPlayer":"34145937","idTeam":"133604",
      |"lookup_player":{"strPlayer":"Harry Kane","strSport":"Soccer"},
      |"ingested_at":1714564800.0}""".stripMargin.replaceAll("\n", "")
  private val darstPlayer =
    """{"idPlayer":"34145938","idTeam":"133605",
      |"lookup_player":{"strPlayer":"Someone","strSport":"Darts"},
      |"ingested_at":1714564800.0}""".stripMargin.replaceAll("\n", "")
  private val validStats =
    """{"idEvent":"1032723","idStatistic":"1","strStat":"Shots","intHome":"12",
      |"intAway":"8","ingested_at":1714564800.0}""".stripMargin.replaceAll("\n", "")
  private val staleTsLeague =
    """{"idLeague":"4335","strLeague":"La Liga","strSport":"Soccer",
      |"strCountry":"Spain","ingested_at":5.0}""".stripMargin.replaceAll("\n", "")

  private lazy val routed = ValidateRoute.plan(
    raw(
      "soccer.league" -> validLeague,
      "soccer.league" -> basketballLeague,
      "soccer.league" -> nullRequiredLeague,
      "soccer.league" -> notJson,
      "soccer.league" -> staleTsLeague,
      "soccer.player" -> validPlayer,
      "soccer.player" -> darstPlayer,
      "soccer.event.stats" -> validStats),
    Schemas.specs)

  test("routing partitions the input: validated + rejected = input (P7/U1)") {
    assert(routed.validated.count() + routed.rejected.count() == 8)
  }

  test("valid soccer rows route to validated with the right topics (P2/P7)") {
    val topics = routed.validated.select("topic").as[String].collect().sorted
    assert(topics.toSeq == Seq(
      "validated.soccer.event.stats", "validated.soccer.league",
      "validated.soccer.league", "validated.soccer.player"))
  }

  test("non-soccer, null-required, and unparseable rows are rejected (P5/P6/P3)") {
    val rej = routed.rejected.select("topic").as[String].collect()
    assert(rej.count(_ == "rejected.soccer.league") == 3)
    assert(rej.count(_ == "rejected.soccer.player") == 1)
  }

  test("nested sport path drives player validation (P6 nested)") {
    val keys = routed.validated.filter(col("topic") === "validated.soccer.player")
      .select("key").as[String].collect()
    assert(keys.toSeq == Seq("34145937"))
  }

  test("NULL payloads (tombstones) route to parse-reject, not schema-reject") {
    val tomb = Seq(("soccer.league", null.asInstanceOf[String]))
      .toDF("topic", "value").withColumn("timestamp", lit(ts))
    val r = ValidateRoute.plan(tomb, Schemas.specs)
    assert(r.validated.count() == 0)
    val rej = r.rejected.select("value").as[String].collect()
    assert(rej.length == 1)
    assert(rej.head.contains("parse_error"), rej.head)
    // the envelope stays keyable: sha2 of the empty payload, not NULL
    val key = r.rejected.select("key").as[String].collect().head
    assert(key != null && key.matches("[0-9a-f]{64}"), s"key=$key")
  }

  test("empty and whitespace-only payloads route to parse-reject, not schema-reject") {
    // from_json('') / from_json('   ') yield a NULL struct with the
    // corrupt column unpopulated — without the data-non-null guard these
    // would read as parse_ok and leak all-null rows into schema-reject.
    val blank = Seq(("soccer.league", ""), ("soccer.league", "   "))
      .toDF("topic", "value").withColumn("timestamp", lit(ts))
    val r = ValidateRoute.plan(blank, Schemas.specs)
    assert(r.validated.count() == 0)
    val rej = r.rejected.select("value").as[String].collect()
    assert(rej.length == 2)
    assert(rej.forall(_.contains("parse_error")), rej.mkString("; "))
  }

  test("parse failures get sha2(json) primary key and parse_error flag (P3/P8)") {
    val parseRow = routed.rejected
      .filter(col("value").contains("parse_error")).select("key").as[String].collect()
    assert(parseRow.length == 1)
    assert(parseRow.head.matches("[0-9a-f]{64}"))
  }

  test("stale ingested_at is repaired from the source timestamp (P9)") {
    // staleTsLeague has ingested_at=5.0 (≤ epoch floor) → repaired to
    // kafka_ts epoch seconds; the envelope re-serializes the repaired value.
    val v = routed.validated
      .filter(col("value").contains("\"idLeague\":\"4335\""))
      .select("value").as[String].head()
    // to_json renders doubles in scientific notation: 1714564800 s → 1.7145648E9
    assert(v.contains(""""ingested_at":1.7145648E9"""))
  }

  test("pk synthesis is stable under null components (P8)") {
    val df = Seq(("a", null: String, "c"), (null, null, null), ("x", "y", "z"))
      .toDF("k1", "k2", "k3")
    val got = ValidateRoute.addPk(df, Seq("k1", "k2", "k3"))
      .select("pk").as[String].collect().toSeq
    assert(got == Seq("a||c", "||", "x|y|z"))
  }

  test("payload hash ignores metadata and column order (P10)") {
    val a = ValidateRoute.addPayloadHash(
      Seq(("v1", "v2", 1.0)).toDF("b", "a", "ingested_at"))
    val b = ValidateRoute.addPayloadHash(
      Seq(("v2", "v1", 99.0)).toDF("a", "b", "ingested_at"))
    assert(a.select("payload_hash").as[String].head() ==
      b.select("payload_hash").as[String].head())
  }

  test("all 13 reference topic specs parse and plan (schema registry)") {
    assert(Schemas.specs.size == 13)
    assert(Schemas.byName("player").schema("lookup_player").dataType
      .isInstanceOf[org.apache.spark.sql.types.StructType])
    // plan builds over all 13 specs without resolution errors
    val r = ValidateRoute.plan(raw("soccer.team" -> """{"idTeam":"1"}"""), Schemas.specs)
    assert(r.rejected.count() == 1 && r.validated.count() == 0)
  }

  test("the plan is narrow: no shuffle exchange in the physical plan (§4)") {
    val p = routed.validated.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }

  test("planSinglePass == plan: both routes row-identical on the " +
    "13-topic soak corpus plus edge traffic (hashes, values and all)") {
    // the soak generator fans events across all 13 topic schemas with
    // wrong-sport and garbage seasoning; add the hand-built edge rows
    // (tombstone, blank, unknown topic, nested-sport misses) on top.
    // STAGED to parquet first: inlining the 13-branch generator into
    // plan()'s 39 union branches (which each rescan the source) makes
    // the comparison's optimized tree explode — and a file source is
    // what both topologies read in production anyway.
    val dir = java.nio.file.Files.createTempDirectory("graft-route-eq").toString
    StreamSoak.buildMessages(spark, TestSpark.sf)
      .unionByName(raw(
        "soccer.league" -> validLeague,
        "soccer.league" -> basketballLeague,
        "soccer.league" -> nullRequiredLeague,
        "soccer.league" -> notJson,
        "soccer.league" -> staleTsLeague,
        "soccer.player" -> validPlayer,
        "soccer.player" -> darstPlayer,
        "soccer.event.stats" -> validStats,
        "soccer.league" -> null.asInstanceOf[String],
        "soccer.league" -> "",
        "not-a-soccer-topic" -> validLeague))
      .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    val a = ValidateRoute.plan(corpus, Schemas.specs)
    val b = ValidateRoute.planSinglePass(corpus, Schemas.specs)
    // compare as collected multisets, NOT exceptAll: fusing the
    // 39-branch union tree and the CASE-dispatch tree into one query
    // sends the optimizer into an OOM-grade blowup (each runs fine
    // alone — it is the combined rewrite that explodes), and a driver
    // compare of a fixture-sized corpus is the honest tool anyway
    def multiset(df: DataFrame): Map[Seq[Any], Int] =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    def same(x: DataFrame, y: DataFrame, what: String): Unit = {
      val (mx, my) = (multiset(x), multiset(y))
      assert(mx.nonEmpty, s"$what: empty comparison proves nothing")
      assert(mx == my, s"$what routes diverge: " +
        s"only-in-left=${(mx.keySet -- my.keySet).take(2)} " +
        s"only-in-right=${(my.keySet -- mx.keySet).take(2)}")
    }
    same(a.validated, b.validated, "validated")
    same(a.rejected, b.rejected, "rejected")
    // with dedup ON: the single-pass form keys its state on
    // (topic_name, pk, payload_hash) precisely so a cross-topic
    // (pk, hash) coincidence cannot collapse — batch outputs must
    // still match the per-topic dropDuplicates row for row
    val ad = ValidateRoute.plan(corpus, Schemas.specs, enableDedup = true)
    val bd = ValidateRoute.planSinglePass(corpus, Schemas.specs,
      enableDedup = true)
    same(ad.validated, bd.validated, "validated+dedup")
    same(ad.rejected, bd.rejected, "rejected+dedup")
    // and dedup actually deduped: the soak corpus has no exact
    // duplicate payloads, but the hand-built rows repeat topics —
    // counts must never exceed the dedup-off counts
    assert(bd.validated.count() <= b.validated.count())
  }

  test("nested case-colliding fields route identically through both " +
    "topologies (recursive ordinal flatten — NOTES_r8 watch 3)") {
    import org.apache.spark.sql.types._
    // the reference's player.lookup_player shape one rename away from
    // a nested collision: two inner fields differing only by case, with
    // pk/required/sport all reaching THROUGH the colliding struct
    val spec = graft.schema.TopicSpec(
      name = "nested",
      schema = StructType(Seq(
        StructField("idThing", StringType),
        StructField("player", StructType(Seq(
          StructField("lookup_player", StringType),
          StructField("lookup_Player", StringType),
          StructField("strSport", StringType)))),
        StructField("ingested_at", DoubleType))),
      pk = Seq("idThing", "player.lookup_player"),
      required = Seq("idThing", "player.lookup_player"),
      sportField = Some("player.strSport"))
    def row(id: String, sport: String) =
      s"""{"idThing":"$id","player":{"lookup_player":"low$id",""" +
        s""""lookup_Player":"UP$id","strSport":"$sport"},""" +
        s""""ingested_at":1714564800.0}"""
    val corpus = raw(
      "soccer.nested" -> row("1", "Soccer"),
      "soccer.nested" -> row("2", "Basketball"), // wrong sport → rejected
      // required player.lookup_player ABSENT while its case-twin is
      // present — exact-name resolution must not accept the twin
      "soccer.nested" -> ("""{"idThing":"3","player":{"lookup_Player":"UP3",""" +
        """"strSport":"Soccer"},"ingested_at":1714564800.0}"""),
      "soccer.nested" -> notJson,
      "soccer.league" -> validLeague)
    val specs = Seq(spec, Schemas.byName("league"))
    val a = ValidateRoute.plan(corpus, specs)
    val b = ValidateRoute.planSinglePass(corpus, specs)
    def multiset(df: DataFrame): Map[Seq[Any], Int] =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(multiset(a.validated) == multiset(b.validated), "validated diverge")
    assert(multiset(a.rejected) == multiset(b.rejected), "rejected diverge")
    // the routing itself is right: only rows 1 (nested) + league validate
    assert(a.validated.count() == 2)
    val v = a.validated.filter(col("topic").endsWith("nested"))
      .select(col("key"), col("value")).head
    // pk reached the EXACT lower-case spelling through the ordinal path
    assert(v.getString(0) == "1|low1", v.getString(0))
    // both case-twins survive serialization with their exact names
    assert(v.getString(1).contains("\"lookup_player\":\"low1\"") &&
      v.getString(1).contains("\"lookup_Player\":\"UP1\""), v.getString(1))
    // row 3 (missing exact required field) and row 2 (wrong sport) reject
    assert(a.rejected.filter(col("topic").endsWith("nested")).count() == 3)
  }

  test("planSinglePass reads the source once per route (plan reads it " +
    "per topic branch)") {
    // stage the corpus so it is ONE parquet source — the generator
    // itself fans 13 branches over events, which would muddy the count
    val dir = java.nio.file.Files.createTempDirectory("graft-route-scan").toString
    StreamSoak.buildMessages(spark, TestSpark.sf).limit(100)
      .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    def scans(df: DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().size
    val multi = ValidateRoute.plan(corpus, Schemas.specs)
    val single = ValidateRoute.planSinglePass(corpus, Schemas.specs)
    // validated: ONE scan; rejected: two (the schema-reject and
    // parse-failure branches split at the parse verdict)
    assert(scans(single.validated) == 1 && scans(single.rejected) == 2)
    // documents the amplification the single-pass form removes
    assert(scans(multi.validated) == 13 && scans(multi.rejected) == 26)
  }
}
