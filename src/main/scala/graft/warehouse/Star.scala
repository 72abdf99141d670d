package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Star-schema warehouse kernel — the reference's ClickHouse dim/fact layer
  * re-expressed Spark-first.
  *
  * Reference: dims `DDL:16-101`, facts `DDL:115-226`, argMax hub view
  * `DDL:447-470`, ReplacingMergeTree upsert semantics `DDL:37,143`
  * (`DDL` = `ClickHouse Data Warehouse Creation + Backfill DDLs.txt` in
  * /root/reference). Operator ids P12-P20, J1/J3, A7-A9 in SURVEY.md §2.
  *
  * Scale design:
  *  - Surrogate keys are `xxhash64` (deterministic, codegen'd, no shuffle);
  *    bit-parity with ClickHouse cityHash64 is not needed — SKs only join
  *    against SKs produced by the same function (SURVEY §2 P13).
  *  - `latestPerKey` is ONE aggregate (`max_by(struct(...), version)`) —
  *    a single shuffle on the key with map-side partial combine (plans as
  *    SortAggregate because of the struct buffer, but `partial_max_by`
  *    still reduces each partition to |keys| rows BEFORE the exchange).
  *    This is the scalable form of "ReplacingMergeTree + argMax": a
  *    window/row_number formulation shuffles and sorts every input row;
  *    max_by ships only one row per key per partition.
  *  - Dim tables are small relative to facts → always broadcast-joined.
  */
object Star {

  /** P13: deterministic 64-bit surrogate key (cityHash64 role). */
  def sk(c: Column): Column = xxhash64(c)

  /** P14: zero natural keys mean "absent" → NULL surrogate key. */
  def skNullIfZero(c: Column): Column =
    when(coalesce(c, lit(0)) === 0, lit(null)).otherwise(xxhash64(c))

  /** A7/A8/A9: collapse an append log to the latest row per key, versioned
    * by `versionCols` (lexicographic; make it unique for determinism).
    * Covers ClickHouse `argMax(col, updated_at)` × N columns, `anyLast`,
    * and ReplacingMergeTree read-time dedup with one aggregate.
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], versionCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    val version = struct(versionCols.map(col): _*)
    val row = max_by(struct(payload.map(col): _*), version).as("_latest")
    df.groupBy(keyCols.map(col): _*)
      .agg(row)
      .select(keyCols.map(col) ++ payload.map(c => col(s"_latest.$c").as(c)): _*)
  }

  /** Streaming analog of [[latestPerKey]] for exactly-duplicated replays
    * (reference VJ:598-604, designed/disabled). Uses
    * `dropDuplicatesWithinWatermark`: with plain `dropDuplicates` the
    * watermark never evicts state unless the event-time column is part of
    * the dedup key — business-keyed dedup state would grow unboundedly. */
  def streamingDedup(df: DataFrame, eventTimeCol: String, keys: Seq[String],
                     watermark: String = "48 hours"): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  // ---- dimension builders (P12-P14, A7 analogs on the fixture schema) ----

  /** dim_customer: natural key + SK + attributes (dim_team analog). */
  def dimCustomer(customer: DataFrame): DataFrame =
    customer.select(
      sk(col("c_custkey")).as("customer_sk"),
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment"))

  /** dim_nation ⋈ dim_region denormalized geo dim (broadcast-sized). */
  def dimGeo(nation: DataFrame, region: DataFrame): DataFrame =
    nation.join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        sk(col("n_nationkey")).as("nation_sk"),
        col("n_nationkey"), col("n_name"), col("r_regionkey"), col("r_name"))

  /** fact_order: SK-joined fact with monthly partition column (P20 analog
    * of `PARTITION BY toYYYYMM(event_date)`, DDL:144). */
  def factOrder(orders: DataFrame): DataFrame =
    orders.select(
      sk(col("o_custkey")).as("customer_sk"),
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"),
      date_format(col("o_orderdate"), "yyyyMM").as("order_month"))

  // ---- star queries ----

  /** J1/J3: full star join — lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region,
    * revenue per region. nation/region are broadcast (tiny); the
    * lineitem⋈orders join shuffles on the orderkey; AQE handles skew. */
  def regionRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                    nation: DataFrame, region: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      // exact-lattice revenue (per-row 1e-4 quantize -> exact BIGINT
      // sum -> one division): rounding a raw double sum at region-
      // rollup magnitudes (1e9+ at sf0.1, 1e11+ at sf10) flips .xx5
      // boundaries cross-engine — the s31 lesson applied at the source
      .agg(
        (sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000 + lit(0.5)).cast("long")) / lit(10000.0)).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("revenue").desc, col("r_name"))
}
