package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  // a skewed frame: one hot key with 5k rows, 100 cold keys with 10 each
  private lazy val skewed = {
    val hot = spark.range(5000).select(lit(1L).as("k"), col("id").as("v"))
    val cold = spark.range(1000).select((col("id") % 100 + 2).as("k"), col("id").as("v"))
    hot.unionByName(cold)
  }

  test("salted two-phase count equals plain groupBy count") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("n"))
    val salted = Skew.saltedCount(skewed, Seq("k"), salts = 8)
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted agg supports sum/max merge semantics") {
    val plain = skewed.groupBy("k").agg(sum(col("v")).as("s"), max(col("v")).as("m"))
    val salted = Skew.saltedAgg(skewed, Seq("k"), 8,
      partials = Seq(sum(col("v")).as("_s"), max(col("v")).as("_m")),
      merges = Seq(sum(col("_s")).as("s"), max(col("_m")).as("m")))
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted join equals plain join on skewed data") {
    val dim = spark.range(102).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val plain = skewed.join(dim, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8).select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin rejects small-side-preserving join types") {
    val dim = spark.range(10).select(col("id").as("k"))
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", joinType = "full")
    }
    // left_semi stays correct under salting: each big row matches <=1 copy
    val semi = Skew.saltedJoin(skewed, dim, "k", salts = 4, joinType = "left_semi")
    val plainSemi = skewed.join(dim, Seq("k"), "left_semi")
    assert(semi.count() == plainSemi.count())
  }

  test("salting actually spreads the hot key across partitions") {
    val salts = 8
    val perPartition = skewed.filter(col("k") === 1L)
      .withColumn("_salt", Skew.salt(salts))
      .groupBy("_salt").count()
    assert(perPartition.count() > 1, "hot key stayed on one salt")
  }
}
