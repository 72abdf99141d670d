package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Section timing for the x118 snapshot-ANN shape (MvProbe's sibling):
  * appends vs quantizer fit vs per-dir assignment vs the serving
  * probe, so optimization targets the section the time goes to.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.AnnProbe /root/testdata/sf0.1"
  */
object AnnProbe {
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
    import graft.warehouse.Snapshots
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[annprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val emb = Tables(spark, dir, "embeddings")
    (0 to 1).foreach { round =>
      if (round == 1) System.err.println("[annprobe] --- measured round ---")
      val path = java.nio.file.Files.createTempDirectory("graft-annprobe")
        .toString + "/tbl"
      (0 until 3).foreach(m => time(s"append $m") {
        Snapshots.append(spark, path,
          emb.filter(pmod(col("vec_id"), lit(3)) === m))
      })
      val model = time("annIndex (fit+assign)") {
        Snapshots.annIndex(spark, path, "embedding", "vec_id", k = 8)
      }
      val queries = emb.filter(col("vec_id") % 101 === 0)
      time("batchTopK probe+count") {
        graft.ext.IvfIndex.batchTopK(model, queries, "embedding", "vec_id",
          k = 5, nProbes = 8).count()
      }
      // second annIndex on the SAME table: every cache hits — isolates
      // the incremental no-op cost
      time("annIndex warm (cached)") {
        Snapshots.annIndex(spark, path, "embedding", "vec_id", k = 8)
      }
    }
    spark.stop()
  }
}
