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
          maxContamination: Double = 0.2): Stages = {
    val id = col(idCol)

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
    val curated = corpus.select(id, col(textCol))
      .join(prof, Seq(idCol)).join(rep, Seq(idCol)).join(oov, Seq(idCol))
      .filter(col("quality") >= minQuality &&
        col("dup_ngram_frac") <= maxDupNgramFrac &&
        col("lang_guess") =!= "und" && col("oov_rate") <= maxOovRate)
      .select(id, col(textCol), col("lang_guess"))

    // 2) NEAR-DUP KEEP-BEST — x57's keeper over the survivor pair
    // graph: two semi-joins restrict the pair set to curated
    // endpoints, then each connected component keeps its LONGEST
    // member (ties → min id).
    val ids = curated.select(id)
    val spairs = pairs
      .join(ids.withColumnRenamed(idCol, "id_a"), Seq("id_a"), "left_semi")
      .join(ids.withColumnRenamed(idCol, "id_b"), Seq("id_b"), "left_semi")
    val deduped = TextDedup.dedupByPairsKeepBest(curated, idCol, spairs,
      length(col(textCol)))

    // 3) DECONTAMINATE — x20's shingle-overlap gate against the
    // benchmark set: drop survivors whose 3-shingle contamination
    // exceeds the threshold.
    val clean = Decontaminate.decontaminate(deduped, textCol, idCol,
      bench, benchTextCol, maxContamination = maxContamination)

    // 4) MIX — x130's maximal-retention weights over the DETECTED
    // language, applied as weightedSample's deterministic sha256
    // threshold (a row's fate depends on (salt, id) alone — engine-
    // and partitioning-independent). Unmatched / zero-target groups
    // get a null/zero keep_prob and drop, per the weightedSample
    // null-rate contract.
    val weights = Sampling.mixtureWeights(clean, "lang_guess", targets)
      .select(col("group"), col("keep_prob"))
    val withRate = clean.join(broadcast(weights),
      col("lang_guess") === col("group"), "left")
    val sampled = Sampling.weightedSample(withRate, idCol, salt,
        col("keep_prob"))
      .select(id, col(textCol), col("lang_guess"))

    // 5) PACK — x180's concat-and-chunk layout over the final mix
    // (token count = whitespace token count of the text; the packing
    // math is count-agnostic).
    val packed = TextAnalysis.packSequences(
      sampled.select(id,
        size(split(col(textCol), " ")).cast("long").as("n_tokens")),
      idCol, "n_tokens", seqLen)

    Stages(curated, deduped, clean, weights, sampled, packed)
  }
}
