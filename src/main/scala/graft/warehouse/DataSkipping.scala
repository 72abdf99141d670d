package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping: a small per-file statistics manifest
  * (min/max/null-count per column, plus an optional bloom membership
  * index) that prunes which parquet files a predicate has to read —
  * the mechanism behind Delta/Iceberg data skipping, expressed as plain
  * Spark over a directory of files.
  *
  * Why this matters at 100 TB: partition pruning only helps on the
  * partition key. For every OTHER selective predicate, the difference
  * between "read the table" and "read three files" is a manifest lookup
  * — O(#files) driver work against a table the planner would otherwise
  * scan in full. Pairs with [[Layout.zOrder]]: a z-ordered layout keeps
  * each file's min/max footprint a small hyper-rectangle, so range
  * skipping works on EVERY clustered column; for point lookups on keys
  * a range can't separate (high-cardinality, uniformly spread), the
  * bloom manifest skips on membership instead.
  *
  * Scale design:
  *  - the manifest is #files rows — 100k rows for 100 TB in 1 GB files.
  *    Building it is ONE pass (map-side combine per file; at cluster
  *    scale you'd harvest parquet footer stats instead of scanning, but
  *    the contract — and everything downstream — is identical).
  *  - file selection collects ONLY the pruned file list to the driver
  *    (strings), never data. Bloom bitsets never leave the executors:
  *    membership is evaluated on the manifest rows where they live.
  *  - skipping is an OPTIMIZATION, never a semantics change: the full
  *    predicate is re-applied to the surviving files, so a stale or
  *    lossy manifest can only cost speed (extra files read), except
  *    min/max prune which is exact by construction. Bloom false
  *    positives likewise only add files.
  */
object DataSkipping {

  /** Closed-interval predicate `column BETWEEN lo AND hi` against the
    * manifest; `None` leaves that side unbounded. Values must be of the
    * column's type (or coercible literals). */
  final case class Band(column: String, lo: Option[Any], hi: Option[Any]) {
    require(lo.isDefined || hi.isDefined,
      s"band on '$column' must bound at least one side")
  }

  /** One-pass per-file statistics manifest over a parquet directory:
    * `file, n_rows` plus `<c>_min, <c>_max, <c>_nulls` per stat column.
    * Partial aggregation reduces map-side, so the exchange carries one
    * row per (task, file). */
  def buildManifest(spark: SparkSession, path: String,
                    statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "buildManifest needs at least one stat column")
    val df = spark.read.parquet(path)
    val aggs = statCols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(input_file_name().as("file")).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-file bloom membership index over a BIGINT key (canonicalize
    * non-long keys through `xxhash64` on BOTH build and probe — mixed
    * type families hash differently, see [[BloomJoin]]). Size
    * `expectedPerFile` to the rows-per-file of the layout; the bitset is
    * fixed by (expectedPerFile, fpp), so the manifest is deterministic
    * bit-for-bit under any partitioning. */
  def buildBloomManifest(spark: SparkSession, path: String, keyCol: String,
                         expectedPerFile: Long = 1 << 20,
                         fpp: Double = 0.03): DataFrame = {
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(graft.functions.GraftFunctions
          .bloomBuild(spark, col(keyCol), expectedPerFile, fpp).as("bloom"),
        count(lit(1)).as("n_rows"))
  }

  /** Files whose stats overlap every band. A file is pruned when some
    * band's interval provably excludes it: `max < lo`, `min > hi`, or
    * all-null stats (a BETWEEN never matches null). Exact, not
    * probabilistic. Driver-side: collects the surviving file list only. */
  def selectFiles(manifest: DataFrame, bands: Seq[Band]): Seq[String] = {
    require(bands.nonEmpty, "selectFiles needs at least one band")
    val cond = bands.map { b =>
      val notAllNull = col(s"${b.column}_min").isNotNull
      val loOk = b.lo.map(v => col(s"${b.column}_max") >= lit(v))
        .getOrElse(lit(true))
      val hiOk = b.hi.map(v => col(s"${b.column}_min") <= lit(v))
        .getOrElse(lit(true))
      notAllNull && loOk && hiOk
    }.reduce(_ && _)
    manifest.filter(cond).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Files whose bloom says some probe key MIGHT be present. The probe
    * runs WHERE THE MANIFEST ROWS LIVE — a [[graft.functions
    * .BloomContainsAny]] filter carrying the key list as a plan
    * constant — and only surviving file NAMES are collected, exactly
    * like [[selectFiles]]. Never ships a bitset to the driver: at 100 TB
    * (~100k files × ~0.9 MB bitset) the old collect-and-probe shape
    * would move ~90 GB through the driver; this shape moves a list of
    * paths. False positives add files (correctness is the residual
    * filter's job); false negatives cannot happen for inserted keys. */
  def selectFilesByKeys(bloomManifest: DataFrame, keys: Seq[Long]): Seq[String] = {
    require(keys.nonEmpty, "selectFilesByKeys needs at least one key")
    val hit = graft.functions.GraftFunctions.bloomContainsAny(
      bloomManifest.sparkSession, col("bloom"), keys)
    // A NULL bloom (malformed manifest row) must be a MANDATORY hit,
    // not a silent prune: the probe evaluates to NULL there and a bare
    // filter would drop the file — skipping data whose membership is
    // unknown, violating "skipping is never a semantics change".
    bloomManifest.filter(coalesce(hit, lit(true))).select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** The band predicate as a residual filter Column. */
  private[warehouse] def bandFilter(bands: Seq[Band]): Column =
    bands.map { b =>
      val loOk = b.lo.map(v => col(b.column) >= lit(v)).getOrElse(lit(true))
      val hiOk = b.hi.map(v => col(b.column) <= lit(v)).getOrElse(lit(true))
      loOk && hiOk
    }.reduce(_ && _)

  /** Manifest-pruned range read: scan only the files whose stats
    * overlap the bands, then re-apply the full predicate. Result is
    * IDENTICAL to `spark.read.parquet(path).filter(bands)` — only the
    * I/O differs. */
  def skipRead(spark: SparkSession, path: String, manifest: DataFrame,
               bands: Seq[Band]): DataFrame = {
    val files = selectFiles(manifest, bands)
    prunedRead(spark, path, files).filter(bandFilter(bands))
  }

  /** Bloom-pruned point-lookup read: scan only files whose membership
    * index might hold one of `keys`, then re-apply the exact IN filter
    * (bloom false positives die here). */
  def pointSkipRead(spark: SparkSession, path: String, bloomManifest: DataFrame,
                    keyCol: String, keys: Seq[Long]): DataFrame = {
    val files = selectFilesByKeys(bloomManifest, keys)
    prunedRead(spark, path, files).filter(col(keyCol).isin(keys: _*))
  }

  /** Read a pruned file list, preserving the directory's schema when
    * everything was pruned (an empty relation, not an error). */
  private def prunedRead(spark: SparkSession, path: String,
                         files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(path).schema)
    else spark.read.parquet(files: _*)
}
