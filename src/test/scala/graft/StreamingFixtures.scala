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

  /** Load-proof waiter for LIVE-trigger tests: a fixed wall-clock
    * `eventually` reads red on a loaded sandbox purely because the
    * trigger loop runs slow, so the budget here derives from observed
    * micro-batch progress instead. The wait fails only when the
    * stream provably stalls: a query died (its exception surfaces in
    * the message), no progress event — batchId OR progress timestamp
    * advance; Spark emits idle progress every ~10 s — within
    * `stallBudgetMs`, or the generous absolute `capMs` blows with
    * progress still flowing (the file was genuinely skipped). Under
    * load everything merely slows, progress keeps advancing, and the
    * wait rides it out. */
  def eventuallyWithProgress(qs: Seq[org.apache.spark.sql.streaming.StreamingQuery],
                             stallBudgetMs: Long = 90000L,
                             capMs: Long = 300000L)(cond: => Boolean): Unit = {
    val start = System.currentTimeMillis()
    var lastAdvance = start
    def marks: Seq[(Long, String)] = qs.map(q => Option(q.lastProgress)
      .map(p => (p.batchId, p.timestamp)).getOrElse((-1L, "")))
    var lastMarks = marks
    while (!(try cond catch { case _: Exception => false })) {
      qs.find(!_.isActive).foreach { q =>
        assert(false, s"streaming query '${q.name}' died while waiting: " +
          Option(q.exception).map(_.toString).getOrElse("no exception"))
      }
      val now = System.currentTimeMillis()
      val cur = marks
      if (cur != lastMarks) { lastMarks = cur; lastAdvance = now }
      assert(now - lastAdvance < stallBudgetMs,
        s"trigger loop stalled: no progress event for ${now - lastAdvance}" +
          s" ms (budget $stallBudgetMs ms; marks=$cur)")
      assert(now - start < capMs,
        s"condition not met within the $capMs ms absolute cap despite" +
          s" live progress (marks=$cur)")
      Thread.sleep(250)
    }
  }
}
