package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.CorpusPipeline

/** The flagship composition (x182): stage-boundary schemas and the
  * per-stage keep/cut decisions pinned on an engineered corpus where
  * every stage has exactly one designated victim — so a contract
  * drift in ANY stage (a renamed column, a flipped threshold, a
  * changed tie rule) fails here with the stage's name on it, not as
  * an opaque hash diff in the oracle gate. */
class CorpusPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("corpus pipeline: stage-boundary schemas, per-stage survivors, " +
    "and packed mass conservation (x182)") {
    // an English sentence with stopword mass and ≥10 tokens: quality
    // (0.5 + 1 + 1)/3 ≈ 0.83 and lang_guess = 'en'
    val enA = "the cat and the dog walk of the town is big with joy today"
    val enB = "the sun and the moon of this sky is bright with light all day"
    val contaminated =
      "the quiz and the exam of this bench is secret with answers here"
    val corpus = Seq(
      1L -> enA,
      2L -> enA.split(" ").drop(1).mkString(" "), // near-dup of 1 (shorter)
      3L -> enB,
      4L -> "zzz", // one junk token: quality (0+0.3+1)/3 < 0.5 → curation cuts
      5L -> contaminated // == the benchmark text → decontamination cuts
    ).toDF("id", "t")
    val bench = Seq(contaminated).toDF("text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")

    val st = CorpusPipeline.run(corpus, "t", "id", pairs, bench, "text",
      targets = Map("en" -> 1.0), salt = "spec", seqLen = 8L)

    // stage-boundary schemas (the composition's column contract)
    assert(st.curated.columns.toSeq == Seq("id", "t", "lang_guess"))
    assert(st.deduped.columns.toSeq == Seq("id", "t", "lang_guess"))
    assert(st.clean.columns.toSeq == Seq("id", "t", "lang_guess"))
    assert(st.weights.columns.toSeq == Seq("group", "keep_prob"))
    assert(st.sampled.columns.toSeq == Seq("id", "t", "lang_guess"))
    assert(st.packed.columns.toSeq ==
      Seq("id", "seq_id", "doc_offset", "seq_offset", "piece_len"))
    assert(st.packed.schema.fields.forall(_.dataType == LongType))

    // per-stage keep/cut: each stage removes exactly its victim
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(ids(st.curated) == Set(1L, 2L, 3L, 5L), "curation cuts the junk doc")
    assert(ids(st.deduped) == Set(1L, 3L, 5L),
      "keep-best keeps the LONGER near-dup variant (id 1)")
    assert(ids(st.clean) == Set(1L, 3L),
      "decontamination cuts the benchmark-overlapping doc")
    assert(ids(st.sampled) == Set(1L, 3L),
      "keep_prob 1.0 keeps every clean doc")
    val w = st.weights.collect()
    assert(w.length == 1 && w.head.getString(0) == "en" &&
      w.head.getDouble(1) == 1.0)

    // retention funnel: schema, stage order, strictly-consistent
    // counts with the stage frames above (x183's library surface)
    val rep = CorpusPipeline.retentionReport(st, "t")
      .orderBy(col("stage_idx")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rep.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (1L, "curated", 4L), (2L, "deduped", 3L),
      (3L, "clean", 2L), (4L, "sampled", 2L)))
    assert(rep.map(_._4).toSeq.zip(rep.map(_._4).toSeq.tail)
      .forall { case (a, b) => b <= a },
      "token mass must be non-increasing through the funnel")

    // packed output: mass conservation + the full-sequence invariant
    val packed = st.packed.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    val totalTokens = enA.split(" ").length + enB.split(" ").length
    assert(packed.map(_._3).sum == totalTokens,
      "every token of every sampled doc lands in exactly one piece")
    val bySeq = packed.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val lastSeq = (totalTokens - 1) / 8
    assert(bySeq.keySet == (0L to lastSeq).toSet)
    bySeq.foreach { case (s, m) =>
      assert(m == (if (s == lastSeq && totalTokens % 8 != 0)
        totalTokens % 8 else 8L), s"sequence $s holds $m tokens")
    }
  }

  test("exact pre-collapse is lossless under keep-best: the collapsed " +
    "pipeline lands the same survivor set as the uncollapsed one " +
    "(the SCALING s21 duplicate-heavy posture)") {
    // duplicate-heavy corpus: 3 verbatim copies of enA (ids 1,21,31),
    // 2 of enB (3,23), a near-dup of enA (2), and a singleton (7).
    // keep-best keeps the LONGEST member, ties -> min id — on
    // equal-length verbatim copies that IS dedupExact's min-id keeper,
    // which is the whole equivalence argument.
    val enA = "the cat and the dog walk of the town is big with joy today"
    val enB = "the sun and the moon of this sky is bright with light all day"
    val enC = "the bird and the fish of this lake is calm with mist at dawn"
    val corpus = Seq(1L -> enA, 21L -> enA, 31L -> enA,
      2L -> enA.split(" ").drop(1).mkString(" "),
      3L -> enB, 23L -> enB, 7L -> enC).toDF("id", "t")
    // full near-dup pair graph (J >= 0.7): all copy pairs + near-dup edges
    val pairs = Seq((1L, 21L), (1L, 31L), (21L, 31L), (1L, 2L),
      (2L, 21L), (2L, 31L), (3L, 23L)).toDF("id_a", "id_b")
    val bench = Seq("nothing shared here").toDF("text")

    def survivors(c: org.apache.spark.sql.DataFrame,
                  p: org.apache.spark.sql.DataFrame): Set[Long] =
      CorpusPipeline.run(c, "t", "id", p, bench, "text",
        targets = Map("en" -> 1.0), salt = "spec", seqLen = 8L)
        .sampled.select(col("id")).collect().map(_.getLong(0)).toSet

    val collapsed = graft.ext.TextDedup.dedupExact(corpus, "t", "id")
    val collapsedIds = collapsed.select(col("id")).collect()
      .map(_.getLong(0)).toSet
    assert(collapsedIds == Set(1L, 2L, 3L, 7L),
      "dedupExact keeps the min id per text")
    // restrict the pair graph to collapsed endpoints — what a pair
    // generator over the collapsed corpus would emit
    val cPairs = pairs.filter(col("id_a").isin(collapsedIds.toSeq: _*) &&
      col("id_b").isin(collapsedIds.toSeq: _*))
    assert(survivors(collapsed, cPairs) == survivors(corpus, pairs),
      "collapsed and uncollapsed pipelines must land the same survivors")
    assert(survivors(corpus, pairs) == Set(1L, 3L, 7L))
  }

  test("corpus pipeline: a corpus carrying a stage-internal column " +
    "fails fast with a named contract error") {
    val corpus = Seq((1L, "the cat and the dog walk of the town", 0.9))
      .toDF("id", "t", "keep_prob")
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.run(corpus, "t", "id",
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
        Seq("bench text").toDF("text"), "text",
        targets = Map("en" -> 1.0), salt = "spec", seqLen = 8L)
    }
    assert(e.getMessage.contains("keep_prob") &&
      e.getMessage.contains("CorpusPipeline.run"))
  }

  test("staged retention funnel equals the Stages-handle funnel " +
    "(x183 staged serve)") {
    val enA = "the cat and the dog walk of the town is big with joy today"
    val enB = "the sun and the moon of this sky is bright with light all day"
    val contaminated =
      "the quiz and the exam of this bench is secret with answers here"
    val corpus = Seq(
      1L -> enA, 2L -> enA.split(" ").drop(1).mkString(" "),
      3L -> enB, 4L -> "zzz", 5L -> contaminated).toDF("id", "t")
    val root = java.nio.file.Files
      .createTempDirectory("graft-corpus-staged").toString
    try {
      val st = CorpusPipeline.run(corpus, "t", "id",
        Seq((1L, 2L)).toDF("id_a", "id_b"),
        Seq(contaminated).toDF("text"), "text",
        targets = Map("en" -> 1.0), salt = "spec", seqLen = 8L,
        stagingPath = Some(root))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy(col("stage_idx")).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            r.getLong(3))).toSeq
      val fromHandle = rows(CorpusPipeline.retentionReport(st, "t"))
      val fromStaging =
        rows(CorpusPipeline.retentionReportStaged(spark, root, "t"))
      assert(fromStaging == fromHandle)
      assert(fromStaging.map(_._2) ==
        Seq("curated", "deduped", "clean", "sampled"))
      assert(fromStaging.head._3 == 4L)
    } finally org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(root))
  }
}
