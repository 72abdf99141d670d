package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data op that removes (or
  * flags) corpus documents overlapping an evaluation set, so benchmark
  * questions don't leak into training. Standard practice for LLM corpora
  * (n-gram overlap decontamination, as in GPT-3/PaLM/Llama dataset
  * reports): a document is contaminated when too many of its word
  * k-shingles appear in the benchmark's shingle set.
  *
  * Scale design (corpus = 100 TB, benchmark = MBs — wildly asymmetric):
  *  - the benchmark's distinct shingle set is BROADCAST — the corpus
  *    side never shuffles its shingles, the membership probe happens
  *    map-side inside the corpus scan stage;
  *  - the only exchange is the per-document count aggregation, which
  *    partial-aggregates to ≤ 2 longs per document per map task;
  *  - shingle STRINGS are joined directly (not hashed) — they stay
  *    inside one stage, so there is nothing to win by hashing, and the
  *    string form keeps the whole operator cross-engine oracle-able.
  */
object Decontaminate {

  /** Per-document contamination profile vs a benchmark corpus.
    *
    * Output: `(doc_id, n_shingles, n_contaminated, contamination)` —
    * distinct k-shingle count, how many of those occur anywhere in the
    * benchmark, and their ratio (0.0–1.0; ratio of exact ints, so it is
    * bit-identical across engines).
    */
  def overlapProfile(docs: DataFrame, textCol: String, idCol: String,
                     bench: DataFrame, benchTextCol: String,
                     k: Int = 3): DataFrame = {
    // the native shingle kernel tokenizes once per ROW no matter where
    // the optimizer splices the expression (TextDedup.shingles PERF
    // note); registered against each frame's OWN session — docs and
    // bench may come from different ones
    def sh(d: DataFrame, textCol: Column): Column = graft.functions.GraftFunctions
      .shingles(d.sparkSession, TextDedup.tokens(textCol), k)
    val benchSh = bench
      .select(explode(array_distinct(sh(bench, col(benchTextCol)))).as("bsh"))
      .distinct()
    val docSh = docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(sh(docs, col(textCol)))).as("sh"))
    // benchSh is distinct, so the left join is row-preserving: one output
    // row per (doc, shingle); count(bsh) counts the contaminated ones
    docSh.join(broadcast(benchSh), docSh("sh") === benchSh("bsh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("bsh")).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
  }

  /** Documents whose contamination is at most `maxContamination` —
    * the kept (clean) training set, original columns intact. */
  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
                    bench: DataFrame, benchTextCol: String,
                    k: Int = 3, maxContamination: Double = 0.2): DataFrame = {
    val cleanIds = overlapProfile(docs, textCol, idCol, bench, benchTextCol, k)
      .filter(col("contamination") <= maxContamination)
      .select(col("doc_id").as("_graft_clean_id"))
    docs.join(cleanIds, col(idCol) === col("_graft_clean_id"), "left_semi")
  }
}
