package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Section timing for the containment-pairs shape shared by
  * x116/x124/x129 (MvProbe's sibling): shingle staging vs candidate
  * generation vs the verify join, so optimization targets the section
  * the time goes to.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DedupProbe /root/testdata/sf0.1"
  */
object DedupProbe {
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
    import graft.ext.TextDedup
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[dedupprobe] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables(spark, dir, "documents")
    // the excerptCorpus shape (docs + first-third excerpt copies)
    val base = docs.select(col("doc_id").as("id"),
      TextDedup.normalize(col("text")).as("t"))
    val exc = base
      .select((col("id") + 1000000).as("id"), split(col("t"), " ").as("_tk"))
      .select(col("id"), array_join(slice(col("_tk"), lit(1),
        greatest(floor(size(col("_tk")) / 3).cast("int"), lit(1))), " ")
        .as("t"))
    val corpus = base.unionByName(exc)
    (0 to 1).foreach { round =>
      if (round == 1) System.err.println("[dedupprobe] --- measured round ---")
      val stage = java.nio.file.Files.createTempDirectory("graft-dedupprobe")
        .toString
      val pairs = time("containmentPairs total") {
        val p = TextDedup.containmentPairs(corpus, "t", "id", shingleK = 3,
          maxDf = 4, minContainment = 0.5, stagingPath = Some(stage + "/sh"))
        noop(p)
        p
      }
      time("  re-run from staged") { noop(pairs) }
      // section decomposition (mirrors containmentPairs' stages)
      val shPlain = corpus
        .select(col("id"), TextDedup.tokens(col("t")).as("_toks"))
        .select(col("id"),
          array_distinct(TextDedup.shinglesOfTokens(col("_toks"), 3)).as("sh"))
      time("  shingles re-norm + HOF") { noop(shPlain) }
      val shPre = corpus
        .select(col("id"), split(col("t"), " ").as("_toks"))
        .select(col("id"), array_distinct(graft.functions.GraftFunctions
          .shingles(spark, col("_toks"), 3)).as("sh"))
      time("  shingles pre-norm + kernel") { noop(shPre) }
      time("  shingle stage write") {
        shPre.write.mode("overwrite").parquet(stage + "/sh2")
      }
      val sh2 = spark.read.parquet(stage + "/sh2")
      val inv = sh2.select(lit(0).as("band"), explode(col("sh")).as("bh"),
        col("id"))
      time("  inv explode (no agg)") { noop(inv) }
      val cand = inv.groupBy(col("band"), col("bh"))
        .agg(collect_list(struct(col("id"))).as("es"))
        .filter(size(col("es")).between(2, 4))
        .select(array_sort(col("es")).as("es"))
        .select(explode(expr(
          "flatten(transform(sequence(0, size(es) - 2), i -> " +
            "transform(sequence(i + 1, size(es) - 1), j -> " +
            "struct(element_at(es, i + 1).id AS id_a, " +
            "element_at(es, j + 1).id AS id_b))))")).as("p"))
        .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .filter(col("id_a") < col("id_b"))
        .distinct()
      time("  candidates (bucket agg)") { noop(cand) }
      val a = sh2.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sh2.select(col("id").as("id_b"), col("sh").as("sh_b"))
      time("  verify join+score") {
        noop(cand.join(a, "id_a").join(b, "id_b")
          .select(col("id_a"), col("id_b"),
            size(array_intersect(col("sh_a"), col("sh_b"))).as("_i"),
            size(col("sh_a")).as("_na"), size(col("sh_b")).as("_nb")))
      }
    }
    spark.stop()
  }
}
