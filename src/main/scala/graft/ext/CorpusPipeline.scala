package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The flagship pretraining-corpus composition: the five curation
  * stages every LLM data pipeline chains — quality curation (the x40
  * verdict), near-dup dedup keeping the best variant (x57), benchmark
  * decontamination (x20), mixture reweighting with a deterministic
  * sampled apply (x130 × weightedSample), and concat-and-chunk
  * sequence packing (x180) — run as ONE pipeline, stage contracts
  * pinned.
  *
  * Each stage is the already-shipped operator, not a re-spelling: the
  * value here is proving they COMPOSE — no column collisions, filters
  * and tie rules feeding each other exactly as documented — and giving
  * the chain one value-checkable output (the (doc, sequence) slice
  * plan), hash-matched against a full cross-engine replay of the
  * composed rule (the x182 oracle).
  *
  * Scale shape: every stage keeps its own 100 TB posture — three
  * narrow text scans + a broadcast vocab (curate), the banded pair
  * graph restricted to survivors by two semi-joins (dedup; a candidate
  * pair is a pairwise property, so the survivor graph IS the full
  * graph's survivor-restriction), a broadcast benchmark-shingle set
  * (decontaminate), a |groups|-sized weight frame applied as a
  * scan-time sha256 threshold (mix), and the band-decomposed packing
  * prefix-sum (pack). Nothing cardinality-proportional lands on the
  * driver.
  *
  * Reference role: the transform-on-ingest MV chain's composition
  * discipline (kickhouse DDL:236-439) applied at LLM-pipeline scale.
  */
object CorpusPipeline {

  /** Every stage boundary, exposed so callers (and the spec) can pin
    * schemas and per-stage invariants; `packed` is the pipeline
    * output. */
  case class Stages(curated: DataFrame, deduped: DataFrame,
                    clean: DataFrame, weights: DataFrame,
                    sampled: DataFrame, packed: DataFrame)

  /** Run the full chain over a `(idCol, textCol)` corpus.
    *
    * @param pairs    near-dup candidate pairs over the corpus
    *                 (`id_a`/`id_b`; e.g. MinHash-LSH output). The
    *                 pipeline restricts them to curation survivors —
    *                 exactly the pair graph of the survivor corpus,
    *                 since LSH candidacy is a pairwise property.
    * @param bench    benchmark (eval-set) frame for decontamination.
    * @param targets  mixture target fractions per detected language
    *                 (the [[Sampling.mixtureWeights]] contract:
    *                 groups absent from the map get keep_prob 0).
    * @param salt     sampling salt for the deterministic mixture
    *                 apply ([[Sampling.weightedSample]]'s sha256 key).
    */
  def run(corpus: DataFrame, textCol: String, idCol: String,
          pairs: DataFrame, bench: DataFrame, benchTextCol: String,
          targets: Map[String, Double], salt: String, seqLen: Long,
          vocabK: Int = 30, minQuality: Double = 0.5,
          maxDupNgramFrac: Double = 0.3, maxOovRate: Double = 0.6,
          maxContamination: Double = 0.2,
          decontaminateK: Int = 8,
          mixCol: String = "lang_guess",
          stagingPath: Option[String] = None): Stages = {
    // the chain joins these stage-internal columns onto the caller's
    // corpus; a corpus already carrying one would otherwise die deep in
    // the chain as an ambiguous-reference AnalysisException instead of
    // a named contract error (packSequences' own Guards call covers its
    // outputs; this covers the columns the stages join in)
    graft.Guards.reserved(corpus, "CorpusPipeline.run",
      Seq("quality", "lang_guess", "dup_ngram_frac", "oov_rate",
        "group", "keep_prob"))
    val id = col(idCol)
    // Stage-boundary staging (the x116/portablePairs discipline):
    // every stage frame is consumed by SEVERAL downstream operators
    // (curated feeds the pair semi-joins AND the keep-best scorer;
    // clean feeds the weight aggregate AND the sampled join), and
    // Spark re-executes the whole upstream lineage per consumer — at
    // sf0.1 the unstaged chain re-ran the curation text scans ~15×
    // (56 s/query). Writing each boundary to parquet once truncates
    // the lineage: every stage computes exactly once, and re-reads
    // are columnar scans. Pass None only for corpora small enough
    // that recomputation is cheaper than the write (specs).
    def staged(df: DataFrame, tag: String): DataFrame = stagingPath match {
      case Some(root) =>
        val p = s"$root/$tag"
        df.write.mode("overwrite").parquet(p)
        df.sparkSession.read.parquet(p)
      case None => df
    }
    // the mix key is either the DETECTED language (computed by the
    // curate stage) or a caller column already on the corpus (e.g.
    // the crawl source) — carried through every stage boundary
    val carry: Seq[org.apache.spark.sql.Column] =
      if (mixCol == "lang_guess") Seq.empty else Seq(col(mixCol))

    // 1) CURATE — the x40 verdict: quality score, language id,
    // repetition fraction, vocabulary coverage → one keep/cut filter.
    // Survivors carry (id, text, lang_guess): lang_guess is the mix
    // key downstream, text feeds dedup scoring / decontamination /
    // packing lengths.
    val prof = TextAnalysis.profile(corpus, textCol, idCol)
      .select(id, col("quality"), col("lang_guess"))
    val rep = TextAnalysis.repetitionProfile(corpus, textCol, idCol)
      .select(col("doc_id").as(idCol), col("dup_ngram_frac"))
    val vocab = TextAnalysis.tokenTopK(corpus, textCol, vocabK)
      .select(col("token"))
    val oov = TextAnalysis.oovProfile(corpus, textCol, idCol, vocab)
      .select(id, col("oov_rate"))
    val curated = staged(corpus.select(Seq(id, col(textCol)) ++ carry: _*)
      .join(prof, Seq(idCol)).join(rep, Seq(idCol)).join(oov, Seq(idCol))
      .filter(col("quality") >= minQuality &&
        col("dup_ngram_frac") <= maxDupNgramFrac &&
        col("lang_guess") =!= "und" && col("oov_rate") <= maxOovRate)
      .select(Seq(id, col(textCol), col("lang_guess")) ++ carry: _*),
      "curated")

    // 2) NEAR-DUP KEEP-BEST — x57's keeper over the survivor pair
    // graph: two semi-joins restrict the pair set to curated
    // endpoints, then each connected component keeps its LONGEST
    // member (ties → min id).
    val ids = curated.select(id)
    val spairs = pairs
      .join(ids.withColumnRenamed(idCol, "id_a"), Seq("id_a"), "left_semi")
      .join(ids.withColumnRenamed(idCol, "id_b"), Seq("id_b"), "left_semi")
    val deduped = staged(TextDedup.dedupByPairsKeepBest(curated, idCol,
      spairs, length(col(textCol))), "deduped")

    // 3) DECONTAMINATE — x20's shingle-overlap gate against the
    // benchmark set, at 8-token shingles by default: a corpus-scale
    // benchmark covers most TRIgrams incidentally (at sf0.1 a 10%
    // bench emptied the corpus through the 3-shingle gate), while
    // verbatim 8-gram overlap is genuine contamination — the
    // n-gram-length discipline decontamination actually runs at.
    val clean = staged(Decontaminate.decontaminate(deduped, textCol,
      idCol, bench, benchTextCol, k = decontaminateK,
      maxContamination = maxContamination), "clean")

    // 4) MIX — x130's maximal-retention weights over `mixCol`,
    // applied as weightedSample's deterministic sha256 threshold (a
    // row's fate depends on (salt, id) alone — engine- and
    // partitioning-independent). Unmatched / zero-target groups get a
    // null/zero keep_prob and drop, per the weightedSample null-rate
    // contract.
    val weights = Sampling.mixtureWeights(clean, mixCol, targets)
      .select(col("group"), col("keep_prob"))
    val withRate = clean.join(broadcast(weights),
      col(mixCol).cast("string") === col("group"), "left")
    val sampled = staged(Sampling.weightedSample(withRate, idCol, salt,
        col("keep_prob"))
      .select(Seq(id, col(textCol), col("lang_guess")) ++ carry: _*),
      "sampled")

    // 5) PACK — x180's concat-and-chunk layout over the final mix
    // (token count = whitespace token count of the text; the packing
    // math is count-agnostic).
    val packed = TextAnalysis.packSequences(
      sampled.select(id,
        size(split(col(textCol), " ")).cast("long").as("n_tokens")),
      idCol, "n_tokens", seqLen)

    Stages(curated, deduped, clean, weights, sampled, packed)
  }

  /** The four staged boundary tags, funnel order. */
  private val stageTags = Seq("curated", "deduped", "clean", "sampled")

  /** The per-stage retention funnel a production curation run
    * publishes: surviving document count and token mass after each
    * stage (curate → dedup → decontaminate → mix). Four one-row
    * aggregates — the report is |stages|-sized regardless of corpus
    * size; each stage frame's lineage executes once per funnel row, so
    * on a staged run prefer [[retentionReportStaged]] (the same report
    * from the boundary files alone, no Stages handle needed). */
  def retentionReport(st: Stages, textCol: String): DataFrame =
    funnel(Seq(st.curated, st.deduped, st.clean, st.sampled), textCol)

  /** [[retentionReport]] served from a [[run]] staging root alone —
    * the production serve shape: a curation run stages its boundaries
    * once, and any later consumer (dashboard, audit, this funnel)
    * reads the parquet boundary files without holding the pipeline's
    * Stages handle or re-deriving any lineage. Four pruned columnar
    * scans, |stages|-sized output. */
  def retentionReportStaged(spark: org.apache.spark.sql.SparkSession,
                            stagingRoot: String, textCol: String): DataFrame =
    funnel(stageTags.map(tag => spark.read.parquet(s"$stagingRoot/$tag")),
      textCol)

  private def funnel(stages: Seq[DataFrame], textCol: String): DataFrame =
    stageTags.zip(stages).zipWithIndex
      .map { case ((name, df), i) =>
        df.agg(
            count(lit(1)).as("n_docs"),
            coalesce(sum(size(split(col(textCol), " ")).cast("long")),
              lit(0L)).as("n_tokens"))
          .select(lit(i + 1L).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      }
      .reduce(_ unionByName _)
}
