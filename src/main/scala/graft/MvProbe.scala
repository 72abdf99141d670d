package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MV-maintenance phase diagnostic (IterBench's sibling): times each
  * phase of one x111-shaped `applyAggDelta` cycle separately — touched
  * scan, staged merge write, install write, marker ops — plus the
  * serve, so optimization work on the loop targets the phase the time
  * actually goes to instead of the loop as a whole.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.MvProbe /root/testdata/sf0.1"
  */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("MVPROBE_V2"))
      spark.sparkContext.hadoopConfiguration
        .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    import graft.stream.{IncrementalMv, MvAgg}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[mvprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val path = java.nio.file.Files.createTempDirectory("graft-mvprobe")
      .toString + "/mv_sum"
    val ev = Tables(spark, dir, "events")
    // warm the JVM/codegen on a first full loop, then measure a second
    (0 to 1).foreach { round =>
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      if (round == 1) System.err.println("[mvprobe] --- measured round ---")
      (0 until 3).foreach { m =>
        val batch = ev.filter(pmod(col("event_id"), lit(3)) === m)
        // phase attribution via the crash-landing hook's timestamps:
        // start→pre-stage = touched scan; pre→post-stage = staged merge
        // write; post-stage→post-install = install write; rest = marker
        val t0 = System.nanoTime()
        var last = t0
        IncrementalMv.faultHook.set { p =>
          val now = System.nanoTime()
          System.err.println(
            f"[mvprobe]   ..$p%-14s +${(now - last) / 1e9}%6.3f s")
          last = now
        }
        time(s"cycle $m applyAggDelta") {
          IncrementalMv.applyAggDelta(batch, m, path, "ts", "event_type",
            org.apache.spark.sql.functions.round(col("value") * 100),
            MvAgg.sumOf)
        }
        IncrementalMv.faultHook.set(_ => ())
      }
      time("serve read+count") {
        IncrementalMv.readAgg(spark, path, MvAgg.sumOf).count()
      }
      if (round == 1) {
        // plan shape of the staged-merge write's dataframe (exchange
        // count is the claim under test: ONE exchange on day)
        val batch = ev.filter(pmod(col("event_id"), lit(3)) === 2)
        val delta = batch.groupBy(to_date(col("ts")).as("day"),
            col("event_type").cast("string").as("key"))
          .agg(sum((col("value") * 100).cast("double")).as("state"))
        val existing = spark.read.parquet(path)
          .select(col("day"), col("key").cast("string").as("key"),
            col("state"))
        val merged = existing.unionByName(delta)
          .repartition(col("day"))
          .groupBy(col("day"), col("key"))
          .agg(sum(col("state")).as("state"))
        merged.write.format("noop").mode("overwrite").save()
        System.err.println(merged.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
