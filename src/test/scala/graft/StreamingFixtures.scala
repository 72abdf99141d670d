package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{StringType, StructField, StructType, TimestampType}

/** Shared fixtures for the streaming suites (StreamingSpec /
  * StreamingRestartSpec / StreamingJoinSpec — split so the suite
  * scheduler can run them in parallel forked JVMs; streaming tests are
  * trigger-latency-bound, and one mega-suite serialized the whole
  * suite's longest tail). */
trait StreamingFixtures extends org.scalatest.Assertions {

  val msgSchema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("value", StringType),
    StructField("timestamp", TimestampType)))

  val validLeague: String =
    """{"idLeague":"4328","strLeague":"EPL","strSport":"Soccer","strCountry":"England","ingested_at":1714564800.0}"""
  val badLeague: String =
    """{"idLeague":"4387","strLeague":"NBA","strSport":"Basketball","strCountry":"USA","ingested_at":1714564800.0}"""

  def writeMessages(dir: String, rows: Seq[(String, String)]): Unit = {
    val json = rows.map { case (t, v) =>
      s"""{"topic":"$t","value":${ujsonEscape(v)},"timestamp":"2024-05-01T12:00:00.000Z"}"""
    }.mkString("\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch0.json"), json)
  }

  def ujsonEscape(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  def eventually(timeoutMs: Long)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline && !(try cond catch { case _: Exception => false })) {
      Thread.sleep(250)
    }
    assert(try cond catch { case _: Exception => false },
      s"condition not met within $timeoutMs ms")
  }
}
