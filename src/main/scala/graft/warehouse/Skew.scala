package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the knobs a 100 TB run needs when AQE's
  * runtime skew-join splitting isn't available (streaming, first-stage
  * aggregations) or when a handful of keys dominate (the classic
  * power-law entity: one team, one boilerplate document, one null-ish key).
  *
  * Two standard constructions, both pure DataFrame transforms:
  *  - salted two-phase aggregation: groupBy((key, salt)) partial →
  *    groupBy(key) final. The hot key's rows spread over `salts`
  *    reducers in phase 1; phase 2 merges `salts` partials per key.
  *  - salted skew join: salt the big (skewed) side randomly, explode the
  *    small side across all salt values, join on (key, salt). The hot
  *    key's probe rows land on `salts` different partitions.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default in this
  * engine's sessions) already re-splits skewed SORT-MERGE join partitions
  * at runtime; these helpers cover the cases it cannot touch.
  */
object Skew {

  /** Uniform random salt in [0, salts). Non-deterministic by design —
    * salting only affects placement, never results. */
  def salt(salts: Int): Column = (rand() * salts).cast("int")

  /** Two-phase salted aggregation for algebraic aggregates.
    *
    * @param partials phase-1 aggregate exprs over (key, salt) groups
    * @param merges   phase-2 exprs merging the phase-1 partial columns
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.withColumn("_salt", salt(salts))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)

  /** Salted count-per-key (the common case packaged). */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int = 16): DataFrame =
    saltedAgg(df, keys, salts,
      partials = Seq(count(lit(1)).as("_n")),
      merges = Seq(sum(col("_n")).as("n")))

  /** Join types whose semantics survive replicating the small side: each
    * big row matches at most one salt copy, and no output row is driven
    * by an unmatched SMALL row. Small-side-preserving types (right/full
    * outer) would emit `salts` copies of every unmatched small row. */
  private val saltableJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
    "left_anti", "leftanti", "cross")

  /** Salted equi-join: `big` (skewed) ⋈ `small` on `key`. The small side
    * is replicated `salts` times (explode of a literal range — cheap when
    * small is dimension-sized), the big side salted randomly; the join key
    * becomes (key, salt) so one hot key spreads over `salts` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(saltableJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"joinType '$joinType' is small-side-preserving: salting would duplicate " +
        s"unmatched small rows $salts times. Supported: $saltableJoinTypes")
    val saltedBig = big.withColumn("_salt", salt(salts))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(explodedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
