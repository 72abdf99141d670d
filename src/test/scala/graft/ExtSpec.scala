package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{Multimodal, Similarity, TextAnalysis, TextDedup}

/** A toy "real" codec with a different container format (little-endian
  * w/h, no magic) and sin-of-length features — proves the Multimodal
  * codec boundary. Top-level CLASS: the factory news one per task, the
  * pattern stateful codecs require (and top-level keeps the factory
  * closure free of the non-serializable spec instance). */
final class LeCodec extends graft.ext.Multimodal.MediaCodec {
  override def decode(c: Array[Byte], mt: String): (Int, Int, Int, Boolean) =
    if (c != null && c.length >= 8) {
      val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // full 4-byte blocks only — frames() must agree (trait contract)
      (bb.getInt(0), bb.getInt(4), (c.length - 8) / 4, true)
    } else (0, 0, 0, false)
  override def features(c: Array[Byte], mt: String, dim: Int): Array[Float] =
    // sin() gives each length a distinct direction (not just scale), so
    // cosine self-similarity is strictly maximal in the ANN check
    Array.tabulate(dim)(i => math.sin(c.length.toDouble * (i + 1)).toFloat)
  override def frames(c: Array[Byte]): Seq[Array[Byte]] =
    c.drop(8).grouped(4).filter(_.length == 4).toSeq
}

class ExtSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private lazy val docs = Tables(spark, sf, "documents")
  private lazy val emb = Tables(spark, sf, "embeddings")

  // ---- dedup ----

  test("exact dedup collapses a doubled corpus to the original (exact)") {
    val doubled = docs.unionByName(docs)
    val kept = TextDedup.dedupExact(doubled, "text", "doc_id")
    assert(kept.count() == docs.count())
  }

  test("exact dedup normalizes case and whitespace") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = TextDedup.dedupExact(df, "text", "doc_id")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("minhash estimates jaccard within tolerance on known-overlap docs") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val df = Seq((1L, a), (2L, b)).toDF("id", "text")
      .select(col("id"), TextDedup.shingles(col("text"), 3).as("sh"))
      .withColumn("sig", TextDedup.minhashSignature(col("sh"), 128))
    val Seq(r1, r2) = df.orderBy("id").collect().toSeq
    val shA = r1.getSeq[String](1).toSet
    val shB = r2.getSeq[String](1).toSet
    val trueJ = shA.intersect(shB).size.toDouble / shA.union(shB).size
    val sigA = r1.getSeq[Long](2)
    val sigB = r2.getSeq[Long](2)
    val estJ = sigA.zip(sigB).count { case (x, y) => x == y }.toDouble / 128
    assert(math.abs(trueJ - estJ) < 0.25, s"true=$trueJ est=$estJ")
  }

  test("removeRepeatedSpans excises corpus-frequent windows, merges overlaps (x61)") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),            // shares the a..h window with doc 2
      (2L, "z z a b c d e f g h q"),          // covered at positions 2..9
      (3L, "x y"),                            // short doc, repeated verbatim
      (4L, "x y"),                            //   -> both empty out entirely
      (5L, "p q r s t u v w p2 q2")           // no repeated window: untouched
    ).toDF("doc_id", "text")
    val got = TextDedup.removeRepeatedSpans(corpus, "text", "doc_id",
        n = 8, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "i j")          // positions 0..7 removed
    assert(got(2L) == "z z q")        // positions 2..9 removed
    assert(got(3L) == "" && got(4L) == "")  // whole-doc window repeated
    assert(got(5L) == "p q r s t u v w p2 q2")
    // idempotence on already-clean output: nothing left repeats
    val again = TextDedup.removeRepeatedSpans(
        got.toSeq.toDF("doc_id", "text"), "text", "doc_id", n = 8, minCount = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == got)
  }

  test("crossDocRepeatedSpans: maximal shared runs, cross-document " +
    "DISTINCT requirement, short docs excluded, span text rebuilt") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j"),      // windows 0..2 of k=8
      (2L, "z z a b c d e f g h q"),    // shares the a..h window (start 2)
      (3L, "m m m m m m m m m m m m"),  // self-repeats ONLY -> no span
      (4L, "x y"),                      // < k tokens: excluded outright
      (5L, "x y")
    ).toDF("doc_id", "text")
    val got = TextDedup.crossDocRepeatedSpans(corpus, "text", "doc_id",
        k = 8, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    // doc 1: window at pos 0 = "a..h" shared with doc 2's pos-2 window;
    // windows 1/2 are unshared -> one maximal run of 1 shingle, 8 tokens
    assert(got == Set(
      (1L, 0L, 8L, 1L, "a b c d e f g h"),
      (2L, 2L, 8L, 1L, "a b c d e f g h")))
    // a run of CONSECUTIVE shared windows merges into one longer span
    val run = Seq(
      (1L, "a b c d e f g h i j"),   // windows at 0,1,2 all shared
      (2L, "a b c d e f g h i j k")
    ).toDF("doc_id", "text")
    val merged = TextDedup.crossDocRepeatedSpans(run, "text", "doc_id",
        k = 8, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(merged == Set((1L, 0L, 10L, 3L), (2L, 0L, 10L, 3L)))
    // minDocs = 3: the pairwise share no longer qualifies
    assert(TextDedup.crossDocRepeatedSpans(run, "text", "doc_id",
      k = 8, minDocs = 3).count() == 0)
  }

  test("crossDocRepeatedSpans maxDocs ceiling: a ubiquitous shingle is " +
    "boilerplate, not a span; spans within the ceiling survive intact") {
    // the same 8-token window in ALL 6 docs (df = 6); a second window
    // shared by exactly 2 docs rides behind it in docs 1-2
    val ubiq = "u1 u2 u3 u4 u5 u6 u7 u8"
    val corpus = (
      Seq((1L, s"$ubiq p q r s t u v w"), (2L, s"$ubiq p q r s t u v w")) ++
      (3L to 6L).map(i => (i, s"$ubiq tail$i"))
    ).toDF("doc_id", "text")
    // DEFAULT ceiling (64) does not bind at df=6 — the ubiquitous
    // window still spans in every doc, and the default output equals
    // the explicit uncapped opt-in exactly (the benign-corpus
    // equality contract behind flipping the default to capped)
    val plain = TextDedup.crossDocRepeatedSpans(corpus, "text", "doc_id",
      k = 8, minDocs = 2)
    assert(plain.filter(col("span_start") === 0).count() == 6)
    val uncapped = TextDedup.crossDocRepeatedSpans(corpus, "text", "doc_id",
      k = 8, minDocs = 2, maxDocs = None)
    assert(plain.exceptAll(uncapped).count() == 0 &&
      uncapped.exceptAll(plain).count() == 0,
      "default ceiling must be a no-op on benign density")
    // ceiling at 3: df=6 shingles drop — only the df=2 pair's full
    // shared run survives, and it no longer fuses with the dropped head
    val capped = TextDedup.crossDocRepeatedSpans(corpus, "text", "doc_id",
        k = 8, minDocs = 2, maxDocs = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(capped.forall { case (id, _, _) => id == 1L || id == 2L })
    assert(capped.nonEmpty && capped.forall { case (_, start, _) => start > 0 },
      s"capped spans must exclude the ubiquitous head window: $capped")
    intercept[IllegalArgumentException] {
      TextDedup.crossDocRepeatedSpans(corpus, "text", "doc_id",
        k = 8, minDocs = 4, maxDocs = Some(3L))
    }
  }

  test("minhashDupPairs finds exact duplicates with jaccard 1.0 (MinHash+LSH)") {
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000)
    val pairs = TextDedup.minhashDupPairs(docs.unionByName(shifted), "text", "doc_id")
    // every doubled doc must surface as a jaccard-1.0 pair; the shared-vocab
    // corpus also contains genuine near-dups above 0.7, which stay.
    val doubled = pairs.filter(col("id_b") - col("id_a") === 1000000L &&
      col("id_b") - lit(1000000L) === col("id_a"))
    assert(doubled.count() == docs.count())
    assert(doubled.filter(col("jaccard") < 1.0).count() == 0)
    assert(pairs.count() >= docs.count())
  }

  test("simhashDupPairs finds exact duplicates at hamming 0 on the doubled " +
    "fixture corpus (the retired rows-only x08 query, kept spec-exercised; " +
    "value bridge: x70 oracles the pairing machinery, FunctionsSpec the hash)") {
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000)
    val pairs = TextDedup.simhashDupPairs(
      docs.unionByName(shifted), "text", "doc_id")
    val doubled = pairs.filter(col("id_b") - col("id_a") === 1000000L)
    assert(doubled.count() == docs.count())
    assert(doubled.filter(col("hamming") =!= 0).count() == 0)
  }

  test("maxPairsPerDoc caps the raw pair surface: best pairs kept per " +
    "anchor, default unlimited unchanged") {
    // 8 exact copies of one document → C(8,2)=28 raw pairs (quadratic
    // in duplicate multiplicity by contract); anchor doc 1 sees 7
    val copies = (1L to 8L).map(i => (i, "alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa")).toDF("doc_id", "text")
    val unlimited = TextDedup.minhashDupPairs(copies, "text", "doc_id")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(unlimited.length == 28)
    val capped = TextDedup.minhashDupPairs(copies, "text", "doc_id",
        maxPairsPerDoc = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // a subset of the raw pairs, ≤3 per anchor, and the jaccard-tie
    // break keeps the LOWEST id_b per anchor (deterministic cut)
    assert(capped.toSet.subsetOf(unlimited.toSet))
    val perAnchor = capped.groupBy(_._1).view.mapValues(_.length)
    assert(perAnchor.values.forall(_ <= 3), perAnchor.toMap.toString)
    assert(perAnchor(1L) == 3 &&
      capped.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(2L, 3L, 4L))
    // cap=0 (the default) is the identity — the oracled surfaces
    // (x12/x13) are unaffected
    val explicit0 = TextDedup.minhashDupPairs(copies, "text", "doc_id",
        maxPairsPerDoc = 0)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(explicit0.sorted.toSeq == unlimited.sorted.toSeq)
    // simhash variant: hamming-ascending cut, same ceiling
    val sim = TextDedup.simhashDupPairs(copies, "text", "doc_id",
        maxPairsPerDoc = 2)
      .select("id_a").collect().map(_.getLong(0))
    assert(sim.nonEmpty && sim.groupBy(identity).values.forall(_.length <= 2))
  }

  test("kernel pairs equal portable pairs at MATCHED params (x59 transitive oracle)") {
    // the invariant x59_kernel_minhash_oracled's DuckDB oracle rests on:
    // at 64 hashes / 16 bands AND verify threshold 0.9 both hash
    // schemes' candidate-miss probability is ~4e-8, so pair set AND
    // exact-jaccard doubles match. The comparison must run the portable
    // side at the SAME 64/16 shape — the r11 sf0.1 differential run
    // proved that a 16/4 portable side (or threshold 0.7, where each
    // scheme misses ~1% of candidates independently) diverges at scale.
    val base = docs.select(col("doc_id").as("id"),
      TextDedup.normalize(col("text")).as("t"))
    val pert = base.select((col("id") + 1000000).as("id"),
      expr("CASE WHEN instr(t, ' ') > 0 THEN substr(t, instr(t, ' ') + 1) " +
        "ELSE t END").as("t"))
    val corpus = base.unionByName(pert)
    def pairMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val kernel = pairMap(TextDedup.minhashDupPairs(corpus, "t", "id",
      shingleK = 3, numHashes = 64, bands = 16, threshold = 0.9))
    val portable = pairMap(TextDedup.portableMinhashDupPairs(corpus, "t", "id",
      shingleK = 3, numPerms = 64, bands = 16, threshold = 0.9))
    assert(kernel.keySet == portable.keySet,
      s"kernelOnly=${kernel.keySet -- portable.keySet} " +
        s"portableOnly=${portable.keySet -- kernel.keySet}")
    assert(kernel.keySet.forall(k => kernel(k) == portable(k)),
      "exact-verify jaccard must be bit-identical across hash schemes")
    assert(kernel.nonEmpty)
  }

  test("minhash staging path (spill-to-parquet) matches the persist path") {
    // the 100 TB shape: the signature table spills to parquet instead of
    // a MEMORY_AND_DISK cache; results must be identical on both paths
    val corpus = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000))
    val stage1 = java.nio.file.Files.createTempDirectory("graft-minhash-stage").toString
    val persisted = TextDedup.minhashDupPairs(corpus, "text", "doc_id")
      .orderBy("id_a", "id_b").collect().toSeq
    val staged = TextDedup.minhashDupPairs(corpus, "text", "doc_id",
      stagingPath = Some(stage1)).orderBy("id_a", "id_b").collect().toSeq
    assert(staged == persisted)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(stage1))
      .anyMatch(p => p.toString.endsWith(".parquet"))) // really staged
    val stage2 = java.nio.file.Files.createTempDirectory("graft-portable-stage").toString
    val pPersisted = TextDedup.portableMinhashDupPairs(docs, "text", "doc_id")
      .orderBy("id_a", "id_b").collect().toSeq
    val pStaged = TextDedup.portableMinhashDupPairs(docs, "text", "doc_id",
      stagingPath = Some(stage2)).orderBy("id_a", "id_b").collect().toSeq
    assert(pStaged == pPersisted)
  }

  test("dedupAgainstIndex: index wins, lower batch id wins, re-ingestion is idempotent") {
    val index = TextDedup.minhashIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
          (2L, "one two three four five six seven eight nine"))
        .toDF("doc_id", "text"), "text", "doc_id")
      .persist()
    val batch = Seq(
      // near-dup of indexed doc 1 (first token dropped) -> dropped
      (10L, "beta gamma delta epsilon zeta eta theta"),
      // fresh content -> kept
      (11L, "completely different words about spark engines at scale"),
      // two near-dups of each other, unrelated to the index -> 12 kept, 13 dropped
      (12L, "red orange yellow green blue indigo violet ultraviolet"),
      (13L, "orange yellow green blue indigo violet ultraviolet"),
      // id already indexed -> dropped before any hashing
      (2L, "whatever text this claims to carry")
    ).toDF("doc_id", "text")
    val kept = TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L))
    // determinism
    val again = TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == kept)
    // a numHashes mismatch vs the index build fails loudly, never
    // silently admits duplicates
    assertThrows[IllegalArgumentException] {
      TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index,
        numHashes = 32, bands = 8)
    }
    index.unpersist()
  }

  test("dedupAgainstIndex equals the online rule applied to whole-corpus kernel pairs") {
    // fixture corpus: documents = the index, perturbed copies = the batch
    val old = docs.select(col("doc_id"), col("text"))
    val batch = docs.select((col("doc_id") + 1000000).as("doc_id"),
      expr("CASE WHEN instr(text, ' ') > 0 THEN substr(text, instr(text, ' ') + 1) " +
        "ELSE text END").as("text"))
    val index = TextDedup.minhashIndex(old, "text", "doc_id").persist()
    val kept = TextDedup.dedupAgainstIndex(batch, "text", "doc_id", index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // reference: same band/bucket/verify machinery over the union, then
    // the direct-edge rule (old ids < 1000000 <= batch ids, pairs are
    // id_a < id_b, so dropped == "appears as some pair's id_b")
    val pairs = TextDedup.minhashDupPairs(
      old.unionByName(batch), "text", "doc_id")
    val droppedRef = pairs.filter(col("id_b") >= 1000000L)
      .select("id_b").collect().map(_.getLong(0)).toSet
    val keptRef = batch.select("doc_id").collect().map(_.getLong(0)).toSet -- droppedRef
    assert(kept == keptRef)
    index.unpersist()
  }

  test("dedupAgainstBandIndex: verdict-identical to dedupAgainstIndex " +
    "on the named-victim and whole-corpus fixtures") {
    def both(batch: org.apache.spark.sql.DataFrame,
             index: org.apache.spark.sql.DataFrame,
             maxBucket: Int = 1000): (Set[Long], Set[Long]) = {
      val bandsT = TextDedup.bandRows(index)
      val plain = TextDedup.dedupAgainstIndex(batch, "text", "doc_id",
        index, maxBucket = maxBucket)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bcast = TextDedup.dedupAgainstBandIndex(batch, "text", "doc_id",
        index, bandsT, maxBucket = maxBucket)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      (plain, bcast)
    }
    // fixture 1: the named-victim batch (index win, within-batch win,
    // re-ingested id) from the dedupAgainstIndex spec above
    val idx1 = TextDedup.minhashIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
          (2L, "one two three four five six seven eight nine"))
        .toDF("doc_id", "text"), "text", "doc_id").persist()
    val batch1 = Seq(
      (10L, "beta gamma delta epsilon zeta eta theta"),
      (11L, "completely different words about spark engines at scale"),
      (12L, "red orange yellow green blue indigo violet ultraviolet"),
      (13L, "orange yellow green blue indigo violet ultraviolet"),
      (2L, "whatever text this claims to carry")).toDF("doc_id", "text")
    val (p1, b1) = both(batch1, idx1)
    assert(b1 == p1 && b1 == Set(11L, 12L))
    idx1.unpersist()
    // fixture 2: the whole-corpus perturbed batch — every doc a near-dup
    val old = docs.select(col("doc_id"), col("text"))
    val batch2 = docs.select((col("doc_id") + 1000000).as("doc_id"),
      expr("CASE WHEN instr(text, ' ') > 0 THEN substr(text, instr(text, ' ') + 1) " +
        "ELSE text END").as("text"))
    val idx2 = TextDedup.minhashIndex(old, "text", "doc_id").persist()
    val (p2, b2) = both(batch2, idx2)
    assert(b2 == p2)
    idx2.unpersist()
    // a numHashes mismatch fails loudly on this path too
    assertThrows[IllegalArgumentException] {
      TextDedup.dedupAgainstBandIndex(batch1, "text", "doc_id", idx1,
        TextDedup.bandRows(idx1, 32, 8), numHashes = 32, bands = 8)
    }
    // and so does a BANDS mismatch vs the persisted band table, in
    // both directions — the silent-admit hole: band keys would match
    // nothing and every index near-dup would pass
    val idx3 = TextDedup.minhashIndex(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"), "text", "doc_id")
    val bands16 = TextDedup.bandRows(idx3, 64, 16)
    assertThrows[IllegalArgumentException] {
      TextDedup.dedupAgainstBandIndex(batch1, "text", "doc_id", idx3,
        bands16, numHashes = 64, bands = 32)
    }
    assertThrows[IllegalArgumentException] {
      TextDedup.dedupAgainstBandIndex(batch1, "text", "doc_id", idx3,
        bands16, numHashes = 64, bands = 8)
    }
    // an EMPTY band table next to a non-empty index is the same
    // silent-admit state (wrong path / zero-row write) and must throw
    assertThrows[IllegalArgumentException] {
      TextDedup.dedupAgainstBandIndex(batch1, "text", "doc_id", idx3,
        bands16.limit(0))
    }
  }

  test("dedupAgainstBandIndex: the maxBucket cap counts index AND batch " +
    "members, exactly like the union-table spelling") {
    // 4 identical indexed docs + 2 identical batch copies: every band
    // bucket holds all 6. Cap 5 < 6 → the bucket is excluded on BOTH
    // paths (dups admitted); cap 6 → pairs generate and the copies drop.
    val text = "the same boilerplate sentence repeated verbatim everywhere"
    val idx = TextDedup.minhashIndex(
      (1L to 4L).map(i => (i, text)).toDF("doc_id", "text"),
      "text", "doc_id").persist()
    val bandsT = TextDedup.bandRows(idx)
    val batch = Seq((10L, text), (11L, text)).toDF("doc_id", "text")
    for ((cap, want) <- Seq(5 -> Set(10L, 11L), 6 -> Set.empty[Long])) {
      val plain = TextDedup.dedupAgainstIndex(batch, "text", "doc_id",
        idx, maxBucket = cap)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bcast = TextDedup.dedupAgainstBandIndex(batch, "text", "doc_id",
        idx, bandsT, maxBucket = cap)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(plain == want, s"plain path at cap $cap")
      assert(bcast == want, s"broadcast path at cap $cap")
    }
    idx.unpersist()
  }

  test("duplicateGroups finds transitive components; dedupByPairs keeps group mins") {
    // components: {1,2,3} (chain), {10,11}, {20,21,22} (triangle-ish);
    // 99 appears in no pair and must pass through dedupByPairs untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (20L, 22L)).toDF("id_a", "id_b")
    val groups = TextDedup.duplicateGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L, 99L).toDF("doc_id")
    val kept = TextDedup.dedupByPairs(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 20L, 99L))
  }

  test("dedupByPairsKeepBest keeps the best-scored member, ties to min id") {
    // {1,2,3}: 2 scores highest -> min-id rule would keep 1, best keeps 2
    // {10,11}: tied scores -> tie-break keeps 10
    // 99 in no pair passes through
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L),
      (99L, 1L)).toDF("doc_id", "score")
    val kept = TextDedup.dedupByPairsKeepBest(docs, "doc_id", pairs, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 99L))
    // empty pair set: everything passes through
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextDedup.dedupByPairsKeepBest(docs, "doc_id", empty, col("score"))
      .count() == 6)
    intercept[IllegalArgumentException] {
      TextDedup.dedupByPairsKeepBest(
        docs.withColumn("_graft_dup_id", col("doc_id")), "doc_id", pairs,
        col("score"))
    }
  }

  test("duplicateGroups on an empty pair set is empty; dedupByPairs guards its reserved column") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(TextDedup.duplicateGroups(empty).count() == 0)
    val docs = Seq(1L, 2L).toDF("doc_id")
    assert(TextDedup.dedupByPairs(docs, "doc_id", empty)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    val clash = docs.withColumn("_graft_dup_id", col("doc_id"))
    intercept[IllegalArgumentException] {
      TextDedup.dedupByPairs(clash, "doc_id", empty)
    }
  }

  test("duplicateGroups converges in O(log diameter): a 200-link chain") {
    // plain 1-hop label propagation would need ~200 iterations; path
    // halving must close this well inside the 30-iteration bound.
    // threshold 0 forces the DISTRIBUTED path (the default would take
    // the driver-side union-find shortcut at this size)
    val chain = (100L until 300L).sliding(2).map(w => (w(0), w(1))).toSeq
      .toDF("id_a", "id_b")
    val groups = TextDedup.duplicateGroups(chain, localEdgeThreshold = 0L).collect()
    assert(groups.length == 200)
    assert(groups.forall(_.getLong(1) == 100L))
  }

  test("duplicateGroups: local union-find path == distributed loop") {
    // adversarial shapes: a chain, a triangle, min-id arriving last,
    // a self-contained 2-cycle, disjoint singleton pairs
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (12L, 10L), (30L, 31L), (40L, 41L), (100L, 2L), (2L, 1L))
      .toDF("id_a", "id_b")
    val local = TextDedup.duplicateGroups(pairs) // default: local path
    val dist = TextDedup.duplicateGroups(pairs, localEdgeThreshold = 0L)
    assert(local.exceptAll(dist).count() == 0 && dist.exceptAll(local).count() == 0,
      s"local=${local.collect().mkString(",")} dist=${dist.collect().mkString(",")}")
    // names/types must agree (nullability may differ: the distributed
    // path's comp comes from an aggregate and is marked nullable)
    assert(local.schema.map(f => (f.name, f.dataType)) ==
      dist.schema.map(f => (f.name, f.dataType)))
  }

  test("duplicateGroups: self-pairs label singletons; null-member pairs drop (both paths)") {
    val pairs = Seq((Some(7L), Some(7L)), (Some(1L), Some(2L)),
      (None, Some(5L))).toDF("id_a", "id_b")
    Seq(1000000L /* local */, 0L /* distributed */).foreach { thr =>
      val got = TextDedup.duplicateGroups(pairs, localEdgeThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L),
        s"threshold $thr: $got")
    }
  }

  test("duplicateGroups: mixed-width id types never take the narrowing shortcut") {
    // idA int, idB long with a value beyond Int range: the local path's
    // long→int cast-back would wrap it, so the gate must fall through to
    // the distributed loop, which widens correctly
    val pairs = Seq((1, 5000000000L)).toDF("id_a", "id_b")
    val got = TextDedup.duplicateGroups(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 5000000000L -> 1L), got.toString)
  }

  test("simhash of identical text is identical; near text is close (SimHash)") {
    val df = TextDedup.withSimhash(Seq(
      (1L, "spark engine for large scale data processing and analytics work"),
      (2L, "spark engine for large scale data processing and analytics work"),
      (3L, "completely different words entirely unrelated content here now"))
      .toDF("id", "text"), "text", "sig")
    val sigs = df.orderBy("id").select("sig").as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(2)) > 10)
  }

  test("simhashDupPairs pairs every doubled doc at hamming 0 (SimHash blocking)") {
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000)
    val pairs = TextDedup.simhashDupPairs(docs.unionByName(shifted), "text", "doc_id")
    assert(pairs.filter(col("hamming") === 0).count() >= docs.count())
  }

  test("simhashDupPairs caps pathological blocks (boilerplate corpus stays bounded)") {
    // 60 identical docs collapse into ONE block: uncapped that is
    // 60*59/2 = 1770 pairs from a single bucket — the quadratic shape
    // maxBucket exists to kill. Over the cap the block pairs nothing;
    // under it, all pairs surface.
    val boiler = (1 to 60).map(i => (i.toLong, "same boilerplate text repeated " +
      "across the whole corpus exactly alike")).toDF("doc_id", "text")
    val capped = TextDedup.simhashDupPairs(boiler, "text", "doc_id", maxBucket = 10)
    assert(capped.count() == 0)
    val uncapped = TextDedup.simhashDupPairs(boiler, "text", "doc_id", maxBucket = 100)
    assert(uncapped.count() == 60L * 59 / 2)
    assert(uncapped.filter(col("hamming") =!= 0).count() == 0)
  }

  // ---- similarity ----

  test("brute-force top-k: self is rank 1 with sim 1.0") {
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    val top = Similarity.bruteForceTopK(emb, "embedding", "vec_id", q, 5).collect()
    assert(top.head.getAs[Long]("vec_id") == 0L)
    assert(math.abs(top.head.getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("LSH ANN recall: query's own bucket contains the query; top-1 = self") {
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    val top = Similarity.lshTopK(emb, "embedding", "vec_id", q, 5).collect()
    assert(top.nonEmpty && top.head.getAs[Long]("vec_id") == 0L)
  }

  test("LSH buckets partition the table (every row gets exactly one bucket)") {
    val planes = Similarity.hyperplanes(8, 64)
    val b = emb.withColumn("bucket",
      Similarity.lshBucket(Similarity.asDouble(col("embedding")), planes))
    assert(b.filter(col("bucket").isNull).count() == 0)
    assert(b.count() == emb.count())
  }

  test("nearDupPairs agrees with a brute-force within-label scan") {
    val brute = {
      val a = emb.select(col("label"), col("vec_id").as("id_a"),
        Similarity.asDouble(col("embedding")).as("ea"))
      val b = emb.select(col("label"), col("vec_id").as("id_b"),
        Similarity.asDouble(col("embedding")).as("eb"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .filter(round(Similarity.cosine(col("ea"), col("eb")), 6) >= 0.3).count()
    }
    val got = Similarity.nearDupPairs(emb, "embedding", "vec_id", "label", 0.3).count()
    assert(got == brute)
  }

  test("IVF index: self in top-1, probes bound the scan (IVF ANN)") {
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    val model = graft.ext.IvfIndex.fit(emb, "embedding", "vec_id", k = 8)
    assert(model.centroids.length == 8)
    val top = graft.ext.IvfIndex.topK(model, "embedding", "vec_id", q, 10).collect()
    assert(top.head.getAs[Long]("vec_id") == 0L)
    assert(top.length == 10)
    // probing fewer clusters scans fewer rows than the whole table
    val probed = model.assigned.filter(col("cluster").isin(0, 1, 2)).count()
    assert(probed < emb.count())
    // at-or-under the bound the quantizer sees everything (pre-sampling parity)
    assert(model.fitRows == emb.count())
  }

  test("IVF local fit: deterministic across calls, equivalent to the " +
    "distributed path under probe-all") {
    import graft.ext.IvfIndex
    // fixture is far below localFitRows — this exercises the driver
    // Lloyd path; determinism = identical centroids call over call
    val m1 = IvfIndex.fit(emb, "embedding", "vec_id", k = 8)
    val m2 = IvfIndex.fit(emb, "embedding", "vec_id", k = 8)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    assert(m1.fitRows == emb.count())
    // forcing the MLlib path (localFitRows = 0) yields different
    // centroids but the SAME probe-all top-k — the centroid-independent
    // contract every oracled consumer relies on
    val mD = IvfIndex.fit(emb, "embedding", "vec_id", k = 8,
      localFitRows = 0L)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def res(m: IvfIndex.Model) =
      IvfIndex.batchTopK(m, queries, "embedding", "vec_id", k = 5, nProbes = 8)
        .orderBy("query_id", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(res(m1) == res(mD))
    // every row still lands in exactly one cluster on the local path
    assert(m1.assigned.count() == emb.count())
  }

  test("hardNegatives: band applies BEFORE the cut — a near-dup top-1 " +
    "is excluded, the best in-band candidates surface") {
    import spark.implicits._
    // query q: a near-dup twin (sim ≈ 1, above the band), plus two
    // in-band candidates at distinct angles, plus an orthogonal one
    // (below the band). All in one bucket.
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val rows = Seq(
      (1L, v(1, 0)),            // query
      (2L, v(0.999, 0.04)),     // near-dup: sim ≈ 0.999 ≥ hiSim
      (3L, v(0.8, 0.6)),        // sim 0.8... make 0.6/0.8: sim = 0.8 — at hiSim boundary, excluded by <
      (4L, v(0.6, 0.8)),        // sim 0.6 — in band
      (5L, v(0.5, 0.866)),      // sim 0.5 — in band
      (6L, v(0, 1)))            // sim 0 — below band
      .toDF("vec_id", "embedding").withColumn("label", lit("b"))
    val got = Similarity.hardNegatives(rows, "embedding", "vec_id", "label",
        k = 2, loSim = 0.2, hiSim = 0.8)
      .filter(col("query_id") === 1L)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    // 2 (near-dup, 0.999) and 3 (exactly 0.8) are above/at the band
    // ceiling; 6 (0.0) below the floor — the cut is 4 then 5
    assert(got.map(_._1).toSeq == Seq(4L, 5L), got.mkString(","))
    assert(got.forall { case (_, s2) => s2 >= 0.2 && s2 < 0.8 })
  }

  test("IVF batchTopK: probe-all equals per-query brute force; partial " +
    "probes hit self and keep high recall") {
    val model = graft.ext.IvfIndex.fit(emb, "embedding", "vec_id", k = 8)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val all = asMap(graft.ext.IvfIndex.batchTopK(model, queries,
      "embedding", "vec_id", k = 5, nProbes = 8)
      .select("query_id", "rank", "neighbor_id"))
    // probe-all is exact: per query, identical to a driver brute force
    val qs = queries.select("vec_id").collect().map(_.getLong(0))
    val vecs = emb.select(col("vec_id"), graft.ext.Similarity.asDouble(col("embedding")))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      // HALF_UP like Spark's round(), not rint's half-even
      BigDecimal(d / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    qs.foreach { q =>
      val brute = vecs.toSeq.map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
      val got = (1 to 5).map(r => all((q, r.toLong)))
      assert(got == brute, s"query $q: got=$got brute=$brute")
    }
    // partial probes: self always lands in its own probed cluster, and
    // recall vs probe-all stays useful (fixture clusters are coherent)
    val partial = asMap(graft.ext.IvfIndex.batchTopK(model, queries,
      "embedding", "vec_id", k = 5, nProbes = 3)
      .select("query_id", "rank", "neighbor_id"))
    // self-match needs the euclidean-assigned home cluster to be among
    // the top-3 cosine-ranked probes — true for coherent clusters but
    // not guaranteed pointwise, so assert in aggregate
    val selfHits = qs.count(q => partial((q, 1L)) == q)
    assert(selfHits >= qs.length * 8 / 10, s"self-match $selfHits/${qs.length}")
    val recall = qs.map(q => (1 to 5).count(r =>
      partial.get((q, r.toLong)).exists(n =>
        (1 to 5).exists(rr => all((q, rr.toLong)) == n)))).sum
    assert(recall >= qs.length * 5 * 0.6, s"recall $recall/${qs.length * 5}")
  }

  test("hardNegatives maxBucket caps the candidate pool per label: every " +
    "query still mines, negatives come from the hash-chosen subset, " +
    "default 0 is the identity") {
    import graft.ext.Similarity
    // one heavy label bucket of 30 vectors spread across the sim band
    val rnd = new scala.util.Random(41)
    val df = (1L to 30L).map { i =>
      val base = Array.fill(8)(rnd.nextFloat() * 2 - 1)
      (i, base, "L")
    }.toDF("vec_id", "embedding", "label")
    val full = Similarity.hardNegatives(df, "embedding", "vec_id", "label",
      k = 3, loSim = -1.0, hiSim = 0.99)
    val explicit0 = Similarity.hardNegatives(df, "embedding", "vec_id", "label",
      k = 3, loSim = -1.0, hiSim = 0.99, maxBucket = 0)
    assert(full.collect().toSet == explicit0.collect().toSet,
      "maxBucket=0 must be the identity")
    val capped = Similarity.hardNegatives(df, "embedding", "vec_id", "label",
      k = 3, loSim = -1.0, hiSim = 0.99, maxBucket = 10)
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(2)))
    // every query row still mines (pool members pair with everyone;
    // non-pool queries pair against the pool) — 30 queries expected
    assert(rows.map(_._1).distinct.length == 30,
      s"queries lost under the cap: ${rows.map(_._1).distinct.length}")
    // the negative pool is the hash-chosen 10 — at most 10 distinct
    // neighbors ever appear, and each appears for many queries
    val pool = rows.map(_._2).distinct
    assert(pool.length <= 10, s"pool leaked past the cap: ${pool.length}")
    // deterministic: same call, same pool
    val again = Similarity.hardNegatives(df, "embedding", "vec_id", "label",
      k = 3, loSim = -1.0, hiSim = 0.99, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(again.toSet == rows.toSet, "cap must be deterministic")
  }

  test("IVF quantized re-rank: exact regime equals batchTopK; the " +
    "production cut (nProbes<k, rerank=4k) keeps recall vs the float path") {
    val model = graft.ext.IvfIndex.fit(emb, "embedding", "vec_id", k = 8)
    val codes = graft.ext.IvfIndex.codes(model, "embedding", "vec_id")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    // probe-all + above-corpus rerank: nothing approximated away — the
    // two-stage pipeline must equal the float path EXACTLY (x112's bridge)
    val exactFloat = rows(graft.ext.IvfIndex.batchTopK(model, queries,
      "embedding", "vec_id", k = 5, nProbes = 8))
    val exactQuant = rows(graft.ext.IvfIndex.batchTopKQuantized(model, codes,
      queries, "embedding", "vec_id", k = 5, nProbes = 8, rerank = 1000000))
    assert(exactQuant == exactFloat,
      s"exact-regime divergence: only-quant=${(exactQuant -- exactFloat).take(3)} " +
        s"only-float=${(exactFloat -- exactQuant).take(3)}")
    // production shape: same probes as the float partial path, rerank=4k
    // — the int8 pre-rank may only reorder WITHIN the probed candidates,
    // so recall is measured against the float path at the same nProbes
    def topIds(s: Set[(Long, Long, Long, Double)]) =
      s.groupBy(_._1).view.mapValues(_.map(_._3)).toMap
    val floatPartial = topIds(rows(graft.ext.IvfIndex.batchTopK(model,
      queries, "embedding", "vec_id", k = 5, nProbes = 3)))
    val quantPartial = topIds(rows(graft.ext.IvfIndex.batchTopKQuantized(
      model, codes, queries, "embedding", "vec_id", k = 5, nProbes = 3)))
    val hits = floatPartial.keys.toSeq.map(q =>
      (quantPartial(q) intersect floatPartial(q)).size).sum
    val total = floatPartial.values.map(_.size).sum
    assert(hits >= total * 8 / 10,
      s"quantized rerank recall $hits/$total vs float path at same probes")
    // exact sims are reported (float, not approximate): every returned
    // (query, neighbor) sim matches the float path's value where shared
    val fq = rows(graft.ext.IvfIndex.batchTopK(model, queries,
      "embedding", "vec_id", k = 5, nProbes = 3))
      .map(t => (t._1, t._3) -> t._4).toMap
    rows(graft.ext.IvfIndex.batchTopKQuantized(model, codes, queries,
      "embedding", "vec_id", k = 5, nProbes = 3))
      .foreach { case (q, _, n, s) =>
        fq.get((q, n)).foreach(f => assert(f == s,
          s"re-rank sim for ($q, $n) is not the exact float sim: $s vs $f"))
      }
  }

  test("IVF sample-fit: quantizer sees a bounded sample, assignment and " +
    "recall still cover the full table") {
    val n = emb.count()
    val model = graft.ext.IvfIndex.fit(emb, "embedding", "vec_id", k = 4,
      maxFitRows = n / 4)
    // the fit input is a strict, bounded subset (bernoulli: expected n/4)
    assert(model.fitRows < n / 2, s"fitRows=${model.fitRows} not bounded")
    assert(model.fitRows > 0)
    // every row is still assigned exactly once
    assert(model.assigned.count() == n)
    assert(model.assigned.filter(col("cluster").isNull).count() == 0)
    // self-recall survives a sample-fit quantizer
    val q = emb.filter(col("vec_id") === 7)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    val top = graft.ext.IvfIndex.topK(model, "embedding", "vec_id", q, 5,
      nProbes = 4).collect()
    assert(top.head.getAs[Long]("vec_id") == 7L)
  }

  // ---- text analysis ----

  test("token counts and ratios are sane on the corpus") {
    val p = TextAnalysis.profile(docs, "text", "doc_id")
    assert(p.filter(col("n_tokens") <= 0).count() == 0)
    assert(p.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(p.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
  }

  test("langId picks the marked language deterministically") {
    val df = Seq(
      (1L, "the cat and the dog is with the bird"),
      (2L, "el perro y la casa de que y el gato"),
      (3L, "xyz qqq zzz")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("l"))
      .orderBy("id").select("l").as[String].collect().toSeq
    assert(got == Seq("en", "es", "und"))
  }

  test("rolling fingerprint is order-sensitive (unlike bag-of-words)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("id", "text")
    val fps = df.select(TextAnalysis.rollingFingerprint(col("text"))).as[Long].collect()
    assert(fps(0) != fps(1))
  }

  // ---- multimodal ----

  private def header(w: Int, h: Int, extra: Int = 0): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + extra)
    bb.put("GRFT".getBytes); bb.putInt(w); bb.putInt(h)
    bb.array()
  }

  test("multimodal: stub decode parses headers and flags failures") {
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", "a.img", header(640, 480), 12L),
      Multimodal.MediaRow(2L, "video", "b.vid", header(1920, 1080, 64), 76L),
      Multimodal.MediaRow(3L, "image", "c.img", "garbage".getBytes, 7L)).toDS()
    val dec = Multimodal.decode(ds).collect().sortBy(_.media_id)
    assert(dec(0).width == 640 && dec(0).ok)
    assert(dec(1).n_frames == 4 && dec(1).ok)
    assert(!dec(2).ok)
  }

  test("multimodal: frame sampling emits one row per sampled frame") {
    val ds = Seq(Multimodal.MediaRow(1L, "video", "b.vid", header(64, 64, 160), 172L)).toDS()
    val frames = Multimodal.frameSample(ds, stride = 2, maxFrames = 3)
    assert(frames.count() == 3)
    assert(frames.select("frame_idx").as[Int].collect().toSeq == Seq(0, 2, 4))
  }

  test("multimodal: binaryFile source loads a media dir into MediaRow") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    (1 to 4).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"img_$i.bin"), header(i * 100, i * 50))
    }
    val ds = Multimodal.loadBinaryDir(spark, dir.toString, "image")
    assert(ds.count() == 4)
    val sized = Multimodal.repartitionBySize(ds, targetBytes = 24L)
    assert(sized.rdd.getNumPartitions >= 2) // 48 bytes total / 24-byte budget
    val dec = Multimodal.decode(sized).collect()
    assert(dec.forall(_.ok))
    assert(dec.map(_.width).sorted.toSeq == Seq(100, 200, 300, 400))
  }

  test("multimodal features feed the similarity stack end-to-end") {
    val ds = (1 to 20).map(i =>
      Multimodal.MediaRow(i.toLong, "image", s"u$i", header(i, i, extra = i), 12L + i)).toDS()
    val feats = Multimodal.features(ds, dim = 16)
    val q = feats.filter(col("media_id") === 1L)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    val top = Similarity.bruteForceTopK(feats, "embedding", "media_id", q, 3).collect()
    assert(top.head.getAs[Long]("media_id") == 1L)
    assert(math.abs(top.head.getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("multimodal: custom codec swaps in; full pipeline runs end-to-end") {
    // sizing → decode → features → ANN join all run unchanged under the
    // custom LeCodec (top-level class; `() => new LeCodec` is the
    // per-task-instance factory shape stateful codecs require)
    def leHeader(w: Int, h: Int, extra: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + extra)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(w); bb.putInt(h)
      bb.array()
    }
    val ds = (1 to 12).map(i =>
      Multimodal.MediaRow(i.toLong, "video", s"u$i", leHeader(i, 2 * i, i), 8L + i)).toDS()
    val sized = Multimodal.repartitionBySize(ds, targetBytes = 32L)
    val dec = Multimodal.decode(sized, () => new LeCodec).collect().sortBy(_.media_id)
    assert(dec.forall(_.ok))
    assert(dec.map(_.width).toSeq == (1 to 12))
    assert(dec.map(_.height).toSeq == (1 to 12).map(_ * 2))
    // stub would reject these (no GRFT magic) — the codec really decides
    assert(Multimodal.decode(sized).collect().forall(!_.ok))
    val feats = Multimodal.features(sized, dim = 8, codec = () => new LeCodec)
    val q = feats.filter(col("media_id") === 12L)
      .select("embedding").head.getSeq[Float](0).map(_.toDouble).toSeq
    val top = Similarity.bruteForceTopK(feats, "embedding", "media_id", q, 3).collect()
    assert(top.head.getAs[Long]("media_id") == 12L)
    // frames under the custom container: FULL 4-byte blocks after an
    // 8-byte header (partial tails are not frames — trait contract)
    val fr = Multimodal.frameSample(sized, stride = 1, maxFrames = 100,
      codec = () => new LeCodec)
    assert(fr.count() == (1 to 12).map(_ / 4).sum)
  }

  test("multimodal guards: empty dataset, zero stride, bad target bytes") {
    val empty = spark.emptyDataset[Multimodal.MediaRow]
    assert(Multimodal.repartitionBySize(empty, 1024L).count() == 0)
    intercept[IllegalArgumentException] {
      Multimodal.repartitionBySize(empty, 0L)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(empty, stride = 0, maxFrames = 3)
    }
  }

  // ---- decontamination / repetition quality ----

  test("decontamination flags benchmark-overlapping docs and keeps clean ones") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // = benchmark
      (2L, "the quick brown fox jumps over the lazy cat"), // near-copy
      (3L, "completely unrelated text about spark engines here"),
      (4L, "the quick brown fox went home early today friends")) // partial
      .toDF("doc_id", "text")
    val bench = docs.filter(col("doc_id") === 1L)
    val prof = graft.ext.Decontaminate
      .overlapProfile(docs, "text", "doc_id", bench, "text")
      .orderBy("doc_id").collect()
    val byId = prof.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(byId(1L)._3 == 1.0)            // the benchmark doc itself
    assert(byId(2L)._3 > 0.5)             // near-copy heavily contaminated
    assert(byId(3L)._2 == 0L)             // disjoint text: zero overlap
    assert(byId(4L)._3 > 0.0 && byId(4L)._3 < 0.5) // shares a prefix only
    val kept = graft.ext.Decontaminate
      .decontaminate(docs, "text", "doc_id", bench, "text", maxContamination = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // original columns intact on the kept set
    assert(graft.ext.Decontaminate
      .decontaminate(docs, "text", "doc_id", bench, "text", maxContamination = 0.5)
      .columns.toSeq == Seq("doc_id", "text"))
  }

  test("repetition profile separates boilerplate from normal text") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now buy now"),
      (2L, "a genuinely varied sentence with mostly distinct words here"))
      .toDF("doc_id", "text")
    val prof = TextAnalysis.repetitionProfile(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(prof(0).getDouble(2) > 0.7)    // dup_token_frac of the spam
    assert(prof(0).getDouble(3) > 0.5)    // dup_ngram_frac of the spam
    assert(prof(1).getDouble(2) == 0.0)
    assert(prof(1).getDouble(3) == 0.0)
    val kept = TextAnalysis.repetitionFilter(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L))
  }

  // ---- portable (cross-engine) dedup formulations ----

  test("portable minhash: doubled docs pair at jaccard 1.0; reported jaccard " +
    "matches brute-force recompute; threshold respected") {
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000)
    val corpus = docs.unionByName(shifted)
    val pairs = TextDedup.portableMinhashDupPairs(corpus, "text", "doc_id")
      .persist()
    val doubled = pairs.filter(col("id_b") - col("id_a") === 1000000L)
    assert(doubled.count() == docs.count())
    assert(doubled.filter(col("jaccard") < 1.0).count() == 0)
    assert(pairs.filter(col("jaccard") < 0.7).count() == 0)
    // every reported jaccard equals the exact value recomputed from the
    // distinct shingle-string sets (identical candidate or not)
    val sets = corpus.select(col("doc_id").as("id"),
      array_distinct(TextDedup.shingles(col("text"), 3)).as("ss"))
    val recomputed = pairs
      .join(sets.select(col("id").as("id_a"), col("ss").as("ss_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("ss").as("ss_b")), "id_b")
      .withColumn("j2",
        size(array_intersect(col("ss_a"), col("ss_b"))).cast("double") /
          size(array_union(col("ss_a"), col("ss_b"))))
    assert(recomputed.filter(col("jaccard") =!= col("j2")).count() == 0)
    pairs.unpersist()
  }

  test("portable simhash16: identical text → identical fp, hamming 0; " +
    "disjoint text → positive hamming") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val fp = TextDedup.portableSimhash16(df, "text", "doc_id")
      .orderBy("id").select("fp").as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp.forall(v => v >= 0 && v <= 0xFFFFL))
    assert(java.lang.Long.bitCount(fp(0) ^ fp(2)) > 0)
  }

  test("portable simhash width law: the 64-bit fingerprint's low 16 bits " +
    "equal the 16-bit fingerprint (same hex chars, same votes)") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven eight"),
      (3L, "alpha beta beta beta gamma irregular votes here")).toDF("doc_id", "text")
    val fp16 = TextDedup.portableSimhash16(df, "text", "doc_id")
      .withColumnRenamed("fp", "fp16")
    val fp64 = TextDedup.portableSimhash(df, "text", "doc_id", bits = 64)
      .withColumnRenamed("fp", "fp64")
    val joined = fp16.join(fp64, "id")
      .select(col("fp16"), col("fp64").bitwiseAND(lit(0xFFFFL)).as("lo16"))
    assert(joined.filter(col("fp16") =!= col("lo16")).count() == 0)
  }

  test("simhashDupPairsFromSig with the kernel signature reproduces " +
    "simhashDupPairs exactly (refactor identity)") {
    val shifted = docs.withColumn("doc_id", col("doc_id") + 1000000)
    val corpus = docs.unionByName(shifted)
    val direct = TextDedup.simhashDupPairs(corpus, "text", "doc_id")
    val sigs = TextDedup.withSimhash(
        corpus.select(col("doc_id").as("id"), col("text")), "text", "sig")
      .select(col("id"), col("sig"))
    val viaSig = TextDedup.simhashDupPairsFromSig(sigs)
    assert(direct.exceptAll(viaSig).count() == 0)
    assert(viaSig.exceptAll(direct).count() == 0)
  }

  // ---- sampling / vocab ----

  test("splitLeakage cross-tabulates near-dup pairs against a split " +
    "assignment (hand fixture)") {
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val assign = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "valid"), (5L, "test")).toDF("id", "split")
    val out = graft.ext.Sampling
      .splitLeakage(pairs, "id_a", "id_b", assign, "id", "split")
      .orderBy("split_lo", "split_hi").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // least/greatest are lexicographic: test < train < valid
    assert(out.toSeq === Seq(
      ("test", "train", 1L, 2L, true),   // (1,2)
      ("test", "valid", 1L, 2L, true),   // (4,5)
      ("train", "train", 1L, 2L, false)) // (1,3)
    )
  }

  test("mixtureWeights: hand-computed keep probabilities, untargeted " +
    "group drops, missing target group ignored") {
    val df = Seq("a", "a", "a", "b", "c").toDF("g") // a:3 b:1 c:1, n=5
    val out = graft.ext.Sampling
      .mixtureWeights(df, "g", Map("a" -> 0.5, "b" -> 0.5, "z" -> 0.1))
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(out.keySet == Set("a", "b", "c")) // 'z' not in corpus: ignored
    assert(out("a").getAs[Long]("n") == 3 &&
      out("a").getAs[Double]("frac") == 0.6)
    val ra = 0.5 / 0.6
    val rb = 0.5 / 0.2
    assert(out("a").getAs[Double]("ratio") == ra &&
      out("b").getAs[Double]("ratio") == rb)
    assert(out("a").getAs[Double]("keep_prob") == ra / rb) // b keeps all
    assert(out("b").getAs[Double]("keep_prob") == 1.0)
    assert(out("c").getAs[Double]("target_frac") == 0.0 &&
      out("c").getAs[Double]("keep_prob") == 0.0) // untargeted: dropped
  }

  test("distributionMatchWeights: hand-computed bin ratios, edge " +
    "clamping, ref-absent corpus bin drops to zero") {
    // corpus: bin0 x4 (incl. a clamped -10), bin1 x4 (incl. clamped 999)
    // reference: bin0 x1, bin1 x3
    val corpus = Seq(-10L, 5L, 5L, 5L, 35L, 35L, 35L, 999L).toDF("v")
    val ref = Seq(5L, 35L, 35L, 35L).toDF("v")
    val out = graft.ext.Sampling
      .distributionMatchWeights(corpus, ref, "v", nBins = 2, lo = 0.0,
        hi = 60.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L).getAs[Long]("n") == 4 && out(1L).getAs[Long]("n") == 4)
    assert(out(0L).getAs[Double]("ratio") == 0.25 / 0.5 &&
      out(1L).getAs[Double]("ratio") == 0.75 / 0.5)
    assert(out(1L).getAs[Double]("keep_prob") == 1.0)
    assert(out(0L).getAs[Double]("keep_prob") == (0.25 / 0.5) / (0.75 / 0.5))
    // a corpus bin the reference never occupies keeps nothing
    val ref2 = Seq(35L).toDF("v")
    val o2 = graft.ext.Sampling
      .distributionMatchWeights(corpus, ref2, "v", 2, 0.0, 60.0)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("keep_prob"))
      .toMap
    assert(o2(0L) == 0.0 && o2(1L) == 1.0)
  }

  test("groupHoldoutSplit keeps whole groups together — zero cross-split " +
    "leakage by construction") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val groups = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id") // 99: no group row
    val assign = graft.ext.Sampling.groupHoldoutSplit(
      ids, "id", groups, "id", "comp", "s", 0.5, 0.25)
    // every group resolves to exactly one split
    assert(assign.join(groups, "id").groupBy("comp")
      .agg(countDistinct(col("split")).as("k")).collect()
      .forall(_.getAs[Long]("k") == 1))
    // and therefore the leakage matrix has no cross-split rows
    val leak = graft.ext.Sampling.splitLeakage(pairs, "id_a", "id_b",
      assign.select(col("id"), col("split")), "id", "split")
    assert(leak.filter(col("cross_split")).count() == 0 && leak.count() > 0)
    // ungrouped rows are singletons keyed by their own id
    assert(assign.filter(col("id") === 99L).head
      .getAs[Long]("group_key") == 99L)
  }

  test("repairSplitLeakage closes transitive chains, freezes train, " +
    "unifies train-free components deterministically") {
    // chain 1-2-3 touches train via 1 -> ALL become train (a direct-link
    // demotion would leave the 2-3 eval pair crossing after one pass);
    // 10-11 has no train member -> both to min('valid','test')='test';
    // 99 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val assign = Seq((1L, "train"), (2L, "valid"), (3L, "test"),
      (10L, "valid"), (11L, "test"), (99L, "valid")).toDF("id", "split")
    val out = graft.ext.Sampling
      .repairSplitLeakage(assign, "id", "split", pairs)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("split_orig"), r.getAs[String]("split"))).toMap
    assert(out(1L) == ("train", "train") && out(2L) == ("valid", "train") &&
      out(3L) == ("test", "train"))
    assert(out(10L) == ("valid", "test") && out(11L) == ("test", "test"))
    assert(out(99L) == ("valid", "valid"))
    // post-condition: the leakage matrix over the repaired split is
    // all same-split
    val repaired = graft.ext.Sampling
      .repairSplitLeakage(assign, "id", "split", pairs)
      .select(col("id"), col("split"))
    val leak = graft.ext.Sampling.splitLeakage(pairs, "id_a", "id_b",
      repaired, "id", "split")
    assert(leak.filter(col("cross_split")).count() == 0)
  }

  test("hash split is deterministic, exhaustive, and ≈ fractions") {
    val split = graft.ext.Sampling.hashSplit(docs, "doc_id", "split", 0.75, 0.125)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n)
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.75) < 0.1)
    // same assignment on recompute (no RNG state)
    val again = graft.ext.Sampling.hashSplit(docs, "doc_id", "split", 0.75, 0.125)
    assert(split.select("doc_id", "split").exceptAll(
      again.select("doc_id", "split")).count() == 0)
    // bernoulli sample is a subset keyed only by id
    val s1 = graft.ext.Sampling.bernoulliSample(docs, "doc_id", "s", 0.25)
    assert(s1.count() > 0 && s1.count() < docs.count())
  }

  test("group-safe split assigns connected near-dups atomically") {
    import spark.implicits._
    val rows = (1L to 10L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    val out = graft.ext.Sampling.groupSafeSplit(rows, "id", pairs, "s", 0.5, 0.25)
      .select("id", "group_id", "split").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    // components share the representative AND the split
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    assert(Seq(7L, 8L).map(out(_)._1).distinct == Seq(7L))
    assert(Seq(7L, 8L).map(out(_)._2).distinct.size == 1)
    // unpaired rows key by their own id — same assignment hashSplit gives
    val plain = graft.ext.Sampling.hashSplit(rows, "id", "s", 0.5, 0.25)
      .select("id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (solo <- Seq(4L, 5L, 6L, 9L, 10L)) {
      assert(out(solo)._1 == solo && out(solo)._2 == plain(solo))
    }
    // exhaustive: every row appears exactly once
    assert(out.size == 10)
  }

  test("duplicate ids never produce self-pairs in LSH candidates") {
    // the same doc ingested twice under one id: buckets contain the id
    // twice; pair generation must not emit (x, x)
    val df = Seq((1L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
    val kernel = TextDedup.minhashDupPairs(df, "text", "doc_id", threshold = 0.1)
    assert(kernel.filter(col("id_a") === col("id_b")).count() == 0)
    val portable = TextDedup.portableMinhashDupPairs(df, "text", "doc_id",
      threshold = 0.1)
    assert(portable.filter(col("id_a") === col("id_b")).count() == 0)
  }

  test("precise Bernoulli sample resolves fractions the 16-bit sampler rounds to zero") {
    val ids = spark.range(1000000).toDF("doc_id")
    val frac = 5e-6 // round(frac * 65536) = 0 → 16-bit sampler keeps nothing
    assert(graft.ext.Sampling.bernoulliSample(ids, "doc_id", "s", frac).count() == 0)
    val kept = graft.ext.Sampling.preciseBernoulliSample(ids, "doc_id", "s", frac).count()
    assert(kept > 0 && kept < 50, s"kept=$kept for expected ~5")
    // determinism: same salt, same sample
    assert(graft.ext.Sampling.preciseBernoulliSample(ids, "doc_id", "s", frac).count() == kept)
    // full-rate keeps everything (threshold saturates)
    assert(graft.ext.Sampling.preciseBernoulliSample(ids, "doc_id", "s", 1.0).count() == 1000000L)
  }

  test("hash split handles fraction sums that round to 1.0; full-rate sample keeps all") {
    val df = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val s = graft.ext.Sampling.hashSplit(df, "doc_id", "s", 0.7, 0.3)
    assert(s.filter(col("split") === "test").count() == 0)
    assert(s.count() == 4)
    assert(graft.ext.Sampling.bernoulliSample(df, "doc_id", "s", 1.0).count() == 4)
  }

  test("sampling ops fail fast when an input column collides with an output column") {
    val withSplit = Seq(1L).toDF("doc_id").withColumn("split", lit("x"))
    assertThrows[IllegalArgumentException] {
      graft.ext.Sampling.hashSplit(withSplit, "doc_id", "s", 0.7, 0.2)
    }
    val withBin = Seq((1L, 10L, 0L)).toDF("doc_id", "n_tokens", "bin")
    assertThrows[IllegalArgumentException] {
      graft.ext.Sampling.packSequences(withBin, "doc_id", "n_tokens",
        budget = 100, shard = pmod(col("doc_id"), lit(8)))
    }
  }

  test("batch ANN top-k: self excluded, ranks ordered by sim, k bounded") {
    val top = Similarity.batchTopK(emb, "embedding", "vec_id", "label", 3)
      .persist()
    assert(top.filter(col("query_id") === col("neighbor_id")).count() == 0)
    val perQuery = top.groupBy("query_id").count()
    assert(perQuery.filter(col("count") > 3).count() == 0)
    // within a query, rank order must match sim order (desc)
    val bad = top.as("x").join(top.as("y"),
        col("x.query_id") === col("y.query_id") &&
          col("x.rank") < col("y.rank") && col("x.sim") < col("y.sim"))
      .count()
    assert(bad == 0, s"$bad rank inversions")
    top.unpersist()
  }

  test("chunk: windows reassemble, overlap agrees, short docs keep one chunk") {
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")), // 20 tokens
      (2L, "only three tokens"),
      (3L, "")
    ).toDF("doc_id", "text")

    // overlap 0: chunks partition the token stream exactly
    val flat = TextAnalysis.chunk(docs, "text", "doc_id", 8, 0)
      .orderBy($"doc_id", $"chunk_idx")
      .groupBy($"doc_id").agg(concat_ws(" ", collect_list($"chunk_text")).as("re"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(flat(1L) == (1 to 20).map(i => s"t$i").mkString(" "))
    assert(flat(2L) == "only three tokens")
    assert(flat(3L) == "")

    // overlap 3 on 8-token windows: consecutive chunks share 3 tokens
    val ch = TextAnalysis.chunk(docs.filter($"doc_id" === 1L), "text", "doc_id", 8, 3)
      .orderBy($"chunk_idx").collect().map(_.getAs[String]("chunk_text"))
    ch.sliding(2).foreach { case Array(a, b) =>
      assert(a.split(" ").takeRight(3).sameElements(b.split(" ").take(3)) ||
        b.split(" ").length < 3, s"overlap mismatch between [$a] and [$b]")
    case _ => ()
    }
    // start offsets advance by step; counts cap at chunk size
    val meta = TextAnalysis.chunk(docs, "text", "doc_id", 8, 3)
      .filter($"doc_id" === 1L).orderBy($"chunk_idx")
      .select($"start_tok", $"n_chunk_tokens").as[(Long, Long)].collect()
    assert(meta.map(_._1).toSeq == Seq(0L, 5L, 10L, 15L))
    assert(meta.map(_._2).toSeq == Seq(8L, 8L, 8L, 5L))

    intercept[IllegalArgumentException] {
      TextAnalysis.chunk(docs, "text", "doc_id", 8, 8)
    }
    val p = TextAnalysis.chunk(docs, "text", "doc_id", 8, 0)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), "chunking must stay narrow:\n" + p)
  }

  test("scrub swallows emails inside URLs, then bare emails; counts see both") {
    val df = Seq((1L, "mail a@b.co and https://x.y/z?e=c@d.co end"))
      .toDF("doc_id", "text")
    val r = df.select(
      TextAnalysis.emailCount(col("text")).as("ne"),
      TextAnalysis.urlCount(col("text")).as("nu"),
      TextAnalysis.scrub(col("text")).as("s")).head
    assert(r.getAs[Int]("ne") == 2)
    assert(r.getAs[Int]("nu") == 1)
    assert(r.getAs[String]("s") == "mail <EMAIL> and <URL> end")
  }

  test("sequence packing: offsets are per-shard running totals, bins are " +
    "contiguous, overflow bounded by one document") {
    val df = Seq((0L, 10L), (1L, 90L), (2L, 50L), (3L, 60L), (4L, 45L),
      (8L, 70L), (9L, 40L), (16L, 200L)).toDF("doc_id", "n_tokens")
    val packed = graft.ext.Sampling.packSequences(df, "doc_id", "n_tokens",
        budget = 100, shard = pmod(col("doc_id"), lit(8)))
      .orderBy("shard", "doc_id").collect()
    val byShard = packed.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (_, rows) =>
      var run = 0L
      rows.foreach { r =>
        assert(r.getAs[Long]("start_offset") == run)
        assert(r.getAs[Long]("bin") == run / 100)
        run += r.getAs[Long]("n_tokens")
      }
      // bins are contiguous from 0
      val bins = rows.map(_.getAs[Long]("bin")).distinct.sorted
      assert(bins.head == 0L && bins.zipWithIndex.forall { case (b, i) => b <= i })
      // a bin's token total exceeds the budget by at most its last doc
      rows.groupBy(_.getAs[Long]("bin")).foreach { case (_, docs) =>
        val total = docs.map(_.getAs[Long]("n_tokens")).sum
        val lastDoc = docs.maxBy(_.getAs[Long]("start_offset"))
        assert(total - lastDoc.getAs[Long]("n_tokens") < 100,
          s"bin overflows by more than its final doc: $total")
      }
    }
  }

  test("token top-k is count-then-token ordered and bounded by k") {
    val top = TextAnalysis.tokenTopK(docs, "text", 10).collect()
    assert(top.length == 10)
    val counts = top.map(_.getAs[Long]("cnt")).toSeq
    assert(counts == counts.sorted.reverse)
  }

  test("containmentPairs: an excerpt scores containment 1 at low Jaccard; " +
    "ubiquitous-shingle-only pairs are blocked; orientation and determinism") {
    // doc 1: 12 distinct tokens; doc 2: its first 4 tokens (a quote) —
    // every shingle of the excerpt appears in the base, so containment
    // (excerpt side) is exactly 1 while Jaccard is 2/10 = 0.2, UNDER a
    // typical near-dup threshold: the pair Jaccard pipelines miss.
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "a b c d"),
      // docs 3-9 all share ONLY the shingle set of "x y z" (df 7 > maxDf
      // 4) — blocked from candidates entirely
      (3L, "x y z"), (4L, "x y z"), (5L, "x y z"), (6L, "x y z"),
      (7L, "x y z"), (8L, "x y z"), (9L, "x y z")).toDF("id", "t")
    val pairs = TextDedup.containmentPairs(corpus, "t", "id",
      shingleK = 3, maxDf = 4, minContainment = 0.5)
    val rows = pairs.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    // base has 10 shingles, excerpt has 2 ("a b c", "b c d"), both shared
    assert(r.getAs[Double]("c_ba") == 1.0)
    assert(r.getAs[Double]("c_ab") == 0.2)
    assert(r.getAs[Double]("jaccard") == 0.2)
    // determinism
    val again = TextDedup.containmentPairs(corpus, "t", "id",
      shingleK = 3, maxDf = 4, minContainment = 0.5).collect()
    assert(again.toSeq == rows.toSeq)
    // minContainment filters: at 1.0 the (1,2) pair still passes (c_ba
    // == 1.0 >= 1.0); a disjoint pair can never appear
    val strict = TextDedup.containmentPairs(corpus, "t", "id",
      shingleK = 3, maxDf = 4, minContainment = 1.0).collect()
    assert(strict.length == 1)
    spark.catalog.clearCache() // release the internal shingle persist
  }

  test("containmentPairs agrees with a brute-force recount on fixture docs") {
    // brute force over a small slice: every pair sharing a rare shingle,
    // recomputed with plain DataFrame ops
    val slice = docs.filter(col("doc_id") < 60)
      .select(col("doc_id").as("id"), TextDedup.normalize(col("text")).as("t"))
    val out = TextDedup.containmentPairs(slice, "t", "id",
      shingleK = 3, maxDf = 10, minContainment = 0.0)
      .orderBy("id_a", "id_b").collect()
    val sh = slice.select(col("id"),
        array_distinct(TextDedup.shingles(col("t"), 3)).as("sh"))
      .collect().map(r => r.getAs[Long]("id") -> r.getSeq[String](1).toSet).toMap
    val dfreq = sh.values.toSeq.flatten.groupBy(identity).map { case (g, o) => g -> o.size }
    val ids = sh.keys.toSeq.sorted
    val expected = for {
      a <- ids; b <- ids if a < b
      shared = sh(a).intersect(sh(b))
      if shared.exists(g => dfreq(g) >= 2 && dfreq(g) <= 10)
    } yield (a, b, shared.size.toDouble / sh(a).size,
      shared.size.toDouble / sh(b).size)
    assert(out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
      r.getAs[Double]("c_ab"), r.getAs[Double]("c_ba"))).toSeq == expected)
    spark.catalog.clearCache()
  }

  test("multimodal: features detach from bytes with stable values") {
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", "a.img", header(1, 1), 12L),
      Multimodal.MediaRow(2L, "image", "b.img", header(2, 2), 12L)).toDS()
    val f1 = Multimodal.features(ds).orderBy("media_id").collect()
    val f2 = Multimodal.features(ds).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Float](1)).toSeq == f2.map(_.getSeq[Float](1)).toSeq)
    assert(f1.head.getSeq[Float](1).length == 16)
  }

  test("packSequences: pieces tile the concat-and-chunk stream exactly " +
    "— per-doc mass conserved, every sequence but the last exactly " +
    "full, equality with the driver-computed reference on signed ids; " +
    "drops and the MinValue raise") {
    import org.apache.spark.sql.functions.{col, lit}
    val L = 10L
    // signed ids (the band lattice must order negatives before
    // positives), token counts straddling the chunk length, plus a
    // null id, a null count and a zero count that must all drop
    val docs = Seq((-7L, 25L), (-2L, 3L), (1L, 10L), (4L, 1L),
      (5L, 18L), (9L, 7L)).toDF("doc_id", "tk")
      .unionByName(Seq((Option.empty[Long], Option(4L)),
        (Option(11L), Option.empty[Long]), (Option(12L), Option(0L)))
        .toDF("doc_id", "tk"))
    val out = TextAnalysis.packSequences(docs, "doc_id", "tk", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // driver reference: concat in id order, chunk at L
    val ref = {
      var st = 0L
      Seq((-7L, 25L), (-2L, 3L), (1L, 10L), (4L, 1L), (5L, 18L),
        (9L, 7L)).flatMap { case (id, tk) =>
        val pieces = (st / L to (st + tk - 1) / L).map { s =>
          (id, s, math.max(s * L - st, 0L), math.max(st - s * L, 0L),
            math.min(st + tk, (s + 1) * L) - math.max(st, s * L))
        }
        st += tk; pieces
      }
    }
    assert(out.sortBy(p => (p._2, p._4)) == ref.sortBy(p => (p._2, p._4)))
    // invariants: mass conservation per doc; full sequences
    val total = 25L + 3 + 10 + 1 + 18 + 7
    assert(out.groupBy(_._1).map { case (id, ps) => id -> ps.map(_._5).sum }
      == Map(-7L -> 25L, -2L -> 3L, 1L -> 10L, 4L -> 1L, 5L -> 18L,
        9L -> 7L))
    val bySeq = out.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val lastSeq = (total - 1) / L
    assert(bySeq.keySet == (0L to lastSeq).toSet)
    bySeq.foreach { case (s, m) =>
      assert(m == (if (s == lastSeq && total % L != 0) total % L else L),
        s"sequence $s holds $m tokens")
    }
    // the one id the lattice cannot order raises, never mis-sorts
    val err = intercept[Exception] {
      TextAnalysis.packSequences(
        Seq((Long.MinValue, 5L), (1L, 5L)).toDF("doc_id", "tk"),
        "doc_id", "tk", L).collect()
    }
    assert(err.getMessage.contains("band lattice") ||
      Option(err.getCause).exists(_.getMessage.contains("band lattice")))
    intercept[IllegalArgumentException] {
      TextAnalysis.packSequences(docs, "doc_id", "tk", 0L)
    }
    // duplicate ids tie in the running-sum window and would place
    // non-deterministically — the per-band guard raises loudly
    val dupErr = intercept[Exception] {
      TextAnalysis.packSequences(
        Seq((1L, 5L), (1L, 7L), (2L, 3L)).toDF("doc_id", "tk"),
        "doc_id", "tk", L).collect()
    }
    assert(dupErr.getMessage.contains("duplicate ids") ||
      Option(dupErr.getCause).exists(_.getMessage.contains("duplicate ids")))

    // grouped variant: each group packs as its OWN stream — per-group
    // output equals running the ungrouped pack on that group's rows
    // alone; null group values drop; idCol cannot be a group col
    val grouped = Seq((-7L, 25L, "a"), (-2L, 3L, "b"), (1L, 10L, "a"),
        (4L, 1L, "b"), (5L, 18L, "a"), (9L, 7L, "b"))
      .toDF("doc_id", "tk", "src")
      .unionByName(Seq((Option(20L), Option(5L), Option.empty[String]))
        .toDF("doc_id", "tk", "src"))
    val gOut = TextAnalysis.packSequences(grouped, "doc_id", "tk", L,
        groupCols = Seq("src"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(!gOut.exists(_._1 == null), "null group values must drop")
    Seq("a", "b").foreach { src =>
      val alone = TextAnalysis.packSequences(
          grouped.filter(col("src") === src), "doc_id", "tk", L)
        .collect().map(r => (src, r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(gOut.filter(_._1 == src).sortBy(p => (p._3, p._5)) ==
        alone.sortBy(p => (p._3, p._5)),
        s"group '$src' must pack as its own stream")
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.packSequences(grouped, "doc_id", "tk", L,
        groupCols = Seq("doc_id"))
    }
  }
}
