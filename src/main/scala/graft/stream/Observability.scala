package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** ST3/ST7: debug sinks and progress observability.
  *
  * The reference polls `q.status`/`q.lastProgress` from a daemon thread
  * every 10 s (`validate_json.py:686-700`); the idiomatic Spark form is a
  * `StreamingQueryListener`, which is push-based and loses no events.
  */
object Observability {

  /** S3: optional console debug sink (reference `DEBUG_CONSOLE`, VJ:656-664). */
  def consoleSink(df: DataFrame, chkDir: String, numRows: Int = 20,
                  trigger: Trigger = Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("console")
      .option("truncate", "false")
      .option("numRows", numRows)
      .option("checkpointLocation", chkDir)
      .trigger(trigger)
      .start()

  /** ST7: progress listener — logs batch id, input rate, and processing
    * rate per progress event; terminations (incl. errors) are surfaced. */
  final class ProgressLogger(log: String => Unit = s => System.err.println(s))
      extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      log(s"[stream] started ${e.name} (${e.id})")
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      log(s"[stream] ${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
        f"in=${p.inputRowsPerSecond}%.1f/s proc=${p.processedRowsPerSecond}%.1f/s")
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      log(s"[stream] terminated ${e.id}" +
        e.exception.map(x => s" WITH ERROR: $x").getOrElse(""))
  }

  def register(spark: org.apache.spark.sql.SparkSession,
               log: String => Unit = s => System.err.println(s)): ProgressLogger = {
    val l = new ProgressLogger(log)
    spark.streams.addListener(l)
    l
  }
}
