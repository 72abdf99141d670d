package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for write
  * paths, so min/max file statistics prune scans on EVERY clustered
  * column, not just the leading sort key.
  *
  * A linear `sortWithinPartitions(a, b)` layout gives perfect file
  * skipping on `a` and none on `b`; interleaving the bits of both keys
  * keeps each parquet file's footprint a small hyper-rectangle in
  * (a, b) space, so a point/range predicate on either column eliminates
  * most files from the scan (the technique behind Delta/Iceberg OPTIMIZE
  * ZORDER). At 100 TB this is the difference between reading one file
  * group and reading the table when the filter is on the second key.
  *
  * Everything here is plain bit-arithmetic column expressions
  * (codegen'd, no UDFs) plus one `repartitionByRange` on the z-value —
  * a single range shuffle, the same cost as any global sort write.
  */
object Layout {

  /** Morton z-value of `n` already-bucketized dimensions: bit `i` of
    * dimension `j` lands at interleaved position `i*n + j`. Inputs are
    * masked to their low `bits` bits (callers bucketize first — see
    * [[minMaxBucket]] or use `pmod` for integral keys; masking keeps the
    * expression total on negatives/overflow).
    *
    * `n * bits` must fit a signed long (≤ 62 used here). */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least 2 dimensions")
    require(bits >= 1 && cols.size * bits <= 62,
      s"${cols.size} dims × $bits bits exceeds a long")
    val mask = (1L << bits) - 1
    val terms = for {
      (c, j) <- cols.zipWithIndex
      masked = c.cast("long").bitwiseAND(lit(mask))
      i <- 0 until bits
    } yield shiftleft(shiftright(masked, i).bitwiseAND(lit(1L)),
      i * cols.size + j)
    terms.reduce(_ + _)
  }

  /** Two-dimension convenience. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** Bucketize arbitrary numeric columns into [0, 2^bits) by min/max
    * scaling — one tiny aggregate broadcast back onto the table (no
    * shuffle of the fact). Constant columns map to bucket 0. Returns the
    * input plus `<col>_zb` bucket columns. */
  def minMaxBucket(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    graft.Guards.reserved(df, "minMaxBucket",
      cols.flatMap(c => Seq(s"${c}_zb", s"_min_$c", s"_max_$c")))
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"_min_$c"),
      max(col(c).cast("double")).as(s"_max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val top = (1L << bits) - 1
    val out = cols.foldLeft(df.crossJoin(broadcast(stats))) { (acc, c) =>
      val lo = col(s"_min_$c")
      val hi = col(s"_max_$c")
      acc.withColumn(s"${c}_zb",
        when(hi === lo, lit(0L)).otherwise(
          floor((col(c).cast("double") - lo) / (hi - lo) * top).cast("long")))
    }
    out.drop(cols.flatMap(c => Seq(s"_min_$c", s"_max_$c")): _*)
  }

  /** Re-lay a table in z-order over `zbCols` (already-bucketized
    * dimension columns): one range shuffle on the z-value, an
    * intra-partition sort, temp column dropped. Write the result with
    * one file per partition and min/max stats prune on every dimension. */
  def zOrder(df: DataFrame, zbCols: Seq[String], bits: Int = 16,
             partitions: Option[Int] = None): DataFrame = {
    graft.Guards.reserved(df, "zOrder", Seq("_graft_z"))
    val tagged = df.withColumn("_graft_z", zValueN(zbCols.map(col), bits))
    val ranged = partitions match {
      case Some(p) => tagged.repartitionByRange(p, col("_graft_z"))
      case None    => tagged.repartitionByRange(col("_graft_z"))
    }
    ranged.sortWithinPartitions("_graft_z").drop("_graft_z")
  }
}
