package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Section timing for the x83/x103 BPE shape (MvProbe's sibling):
  * per-round pair counting and merge application, each in BOTH
  * spellings (interpreted HOF vs native kernel), plus the encode-side
  * vocabulary tokenization — so the kernel claims are isolated from
  * job-scheduling overhead.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BpeProbe /root/testdata/sf0.1"
  */
object BpeProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[bpeprobe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, dir, "documents")
    val words = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val seqs = words.select(col("freq"), split(col("w"), "").as("syms"))
      .persist()
    seqs.count()
    val rules = Seq(("e", " "), (" t", "h"), ("s", " "), ("d", " "),
      ("t", " "), ("a", "n"), ("i", "n"), ("o", "n"))
    (0 to 1).foreach { round =>
      if (round == 1) System.err.println("[bpeprobe] --- measured round ---")
      time("pairs zip_with (HOF)") {
        noop(seqs.select(col("freq"), explode(expr(
            "zip_with(slice(syms, 1, size(syms) - 1), " +
              "slice(syms, 2, size(syms) - 1), (a, b) -> struct(a, b))")).as("p"))
          .groupBy(col("p.a").as("left"), col("p.b").as("right"))
          .agg(sum(col("freq")).as("cnt")))
      }
      time("pairs shingle kernel") {
        noop(seqs.filter(size(col("syms")) >= 2)
          .select(col("freq"), explode(graft.functions.GraftFunctions
            .shingles(spark, col("syms"), 2)).as("p2"))
          .groupBy(substring_index(col("p2"), " ", 1).as("left"),
            substring_index(col("p2"), " ", -1).as("right"))
          .agg(sum(col("freq")).as("cnt")))
      }
      def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
      val hofFold = rules.foldLeft("syms") { case (acc, (l, r)) =>
        s"aggregate($acc, CAST(array() AS array<string>), (acc, x) -> " +
          s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${q(l)}' " +
          s"AND x = '${q(r)}' " +
          s"THEN concat(slice(acc, 1, size(acc) - 1), array('${q(l + r)}')) " +
          s"ELSE concat(acc, array(x)) END)"
      }
      time("8-rule apply HOF nested") {
        noop(seqs.select(size(expr(hofFold)).as("n")))
      }
      time("8-rule apply kernel") {
        noop(seqs.select(size(graft.functions.GraftFunctions
          .bpeApply(spark, col("syms"), rules)).as("n")))
      }
    }
    spark.stop()
  }
}
