package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Section timing for the x167/x174 NB-sweep shape (MvProbe's sibling):
  * train vs apply vs the per-(doc,label) fold, with the fold measured
  * in BOTH spellings (interpreted aggregate(array_sort(...)) HOF vs
  * the graft_pos_sum kernel) in the same JVM, so the kernel claim is
  * isolated from training and join costs.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.NbProbe /root/testdata/sf0.1"
  */
object NbProbe {
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
    import graft.ext.{TextClassify, TextDedup}
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[nbprobe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables(spark, dir, "documents")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    (0 to 1).foreach { round =>
      if (round == 1) System.err.println("[nbprobe] --- measured round ---")
      val model = time("trainNaiveBayes") {
        TextClassify.trainNaiveBayes(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0), "text", "lang")
      }
      val applyHalf = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      val tok = applyHalf.select(col("doc_id").as("id"), col("text"))
        .repartition(cpus.toInt)
        .select(col("id"),
          posexplode(TextDedup.tokens(col("text"))).as(Seq("pos", "tok")))
      val joined = tok.join(model.grid, "tok")
      time("tok join grid (no agg)") { noop(joined) }
      def aggWith(fold: Column => Column): DataFrame =
        joined.groupBy(col("id"), col("label"))
          .agg(fold(collect_list(struct(col("pos"), col("lp")))).as("sum_lp"))
      time("agg fold HOF") {
        noop(aggWith(a => aggregate(array_sort(a), lit(0.0),
          (acc: Column, x: Column) => acc + x.getField("lp"))))
      }
      time("agg fold kernel") {
        noop(aggWith(a =>
          graft.functions.GraftFunctions.posOrderedSum(spark, a)))
      }
      time("scoreFor full (kernel path)") {
        noop(TextClassify.scoreFor(model, applyHalf, "text", "doc_id", "en"))
      }
      model.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
