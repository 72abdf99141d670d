package graft.stream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.TextDedup

/** Streaming near-duplicate filtering against a persistent signature
  * index — the online half of the dedup family: documents arrive as a
  * stream, each micro-batch dedups against everything KEPT so far
  * ([[TextDedup.dedupAgainstIndex]]), and the kept docs' signatures
  * extend the index for the next batch. Signatures are computed once
  * per document ever; corpus text is never re-read.
  *
  * Exactly-once EFFECT on at-least-once `foreachBatch` delivery,
  * WITHOUT a commit ledger: every write is keyed by batch id —
  * {{{
  *   kept  -> <keptPath>/batch_id=<id>/    (overwrite that dir)
  *   index -> <indexPath>/batch_id=<id>/   (overwrite that dir)
  * }}}
  * and the index visible while applying batch N is restricted to
  * `batch_id < N`, so a replay after a crash reads exactly the state
  * the first attempt saw (its own partial output is invisible) and
  * overwrites both dirs with identical content. Re-INGESTED ids (a
  * source that sends a doc twice) drop as duplicates rather than fork:
  * across batches via `dedupAgainstIndex`'s id prefilter, within a
  * batch via an explicit `dropDuplicates` on the id.
  *
  * Online semantics caveat (inherent, documented not hidden): batch N's
  * verdicts depend on what batches < N kept — processing order matters
  * across batches, exactly as in any online dedup. Within a batch the
  * rule is the deterministic lower-id-wins of `dedupAgainstIndex`.
  *
  * Scale: per batch, one band-key exchange of (index ∪ batch) band
  * hashes + the verify joins — |batch| drives the work; the index adds
  * one partition-scoped parquet dir per batch (compact with
  * [[graft.warehouse.Compaction]] offline if batches are tiny).
  */
object StreamingDedup {

  /** Index rows visible to `batchId`: union of the `batch_id=<b>` dirs
    * with b < batchId — explicit listing, so a crashed attempt's own
    * partial dir can never leak into its replay's input. Empty schema
    * bootstraps from a zero-row signature build over `batch`. */
  private[graft] def indexBefore(batch: DataFrame, textCol: String,
                                  idCol: String, indexPath: String,
                                  batchId: Long, shingleK: Int,
                                  numHashes: Int): DataFrame = {
    val spark = batch.sparkSession
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs =
      if (fs.exists(root))
        fs.listStatus(root).map(_.getPath.getName)
          .filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toLong)
          .filter(_ < batchId)
      else Array.empty[Long]
    if (dirs.isEmpty)
      TextDedup.minhashIndex(batch.limit(0), textCol, idCol, shingleK, numHashes)
    else
      spark.read.parquet(dirs.sorted.map(b => s"$indexPath/batch_id=$b"): _*)
  }

  /** Apply one micro-batch: dedup against the visible index, write the
    * kept rows, then extend the index with the kept docs' signatures —
    * REUSED from the batch's staged signature table, not recomputed.
    * Write order (kept → index → staging cleanup) keeps the index
    * derivable from durable kept output at every crash point. */
  private[graft] def applyBatch(batch: DataFrame, batchId: Long,
                                 textCol: String, idCol: String,
                                 keptPath: String, indexPath: String,
                                 shingleK: Int, numHashes: Int, bands: Int,
                                 threshold: Double, maxBucket: Int): Unit = {
    val spark = batch.sparkSession
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // stale-state guard: a dir with a HIGHER batch id than the one being
    // applied can only come from a previous incarnation whose checkpoint
    // was lost — judging new batches against that corpus silently mixes
    // two runs. Fail loudly; the caller clears the outputs or restores
    // the matching checkpoint.
    if (fs.exists(root)) {
      val stale = fs.listStatus(root).map(_.getPath.getName)
        .filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong).filter(_ > batchId)
      require(stale.isEmpty,
        s"index dirs ${stale.sorted.mkString(",")} are AHEAD of batch $batchId — " +
          "output paths belong to a different checkpoint incarnation; " +
          "clear them or restore the original checkpointDir")
    }
    // same-batch duplicate ids: the id prefilter only checks the INDEX,
    // and in-bucket self-pairs are dropped, so two same-id rows in one
    // batch would BOTH survive. Collapse them first (arbitrary row wins
    // — same-id rows are re-sends of the same doc by contract).
    val uniq = batch.dropDuplicates(idCol)
    // ONE physical read of the index per batch: dedupAgainstIndex
    // consumes its index argument in four plan branches (width probe,
    // id anti-join, band explosion, verify lookup); all consumers
    // finish inside this call, so the cache releases before return
    val index = indexBefore(uniq, textCol, idCol, indexPath, batchId,
      shingleK, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // underscore prefix keeps the staging dir invisible to parquet
      // directory listings of <indexPath>
      val staging = s"${indexPath.stripSuffix("/")}/_staging/$batchId"
      val kept = TextDedup.dedupAgainstIndex(uniq, textCol, idCol, index,
        shingleK, numHashes, bands, threshold, maxBucket,
        stagingPath = Some(staging))
      kept.write.mode("overwrite").parquet(s"$keptPath/batch_id=$batchId")
      val keptIds = spark.read.parquet(s"$keptPath/batch_id=$batchId")
        .select(col(idCol).as("id"))
      spark.read.parquet(staging).join(keptIds, Seq("id"))
        .write.mode("overwrite").parquet(s"$indexPath/batch_id=$batchId")
      fs.delete(new Path(staging), true)
    } finally index.unpersist()
  }

  /** Start the streaming dedup: `docs` is a STREAMING DataFrame of
    * documents; kept rows land under `keptPath/batch_id=*`, the
    * signature index under `indexPath/batch_id=*`. Read the kept corpus
    * back with `spark.read.parquet(keptPath)`. */
  def run(docs: DataFrame, textCol: String, idCol: String,
          keptPath: String, indexPath: String, checkpointDir: String,
          shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
          threshold: Double = 0.7, maxBucket: Int = 1000,
          trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // fail at the call site, not asynchronously inside the first batch
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    require(threshold > 0 && threshold <= 1, s"threshold $threshold outside (0,1]")
    docs.writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, textCol, idCol, keptPath, indexPath,
          shingleK, numHashes, bands, threshold, maxBucket)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
