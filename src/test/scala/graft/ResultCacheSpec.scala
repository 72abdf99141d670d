package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.ResultCache

/** Result-cache contract: equivalent plans share an entry, any input
  * mutation invalidates by construction (the key embeds the file
  * fingerprint), nondeterministic plans bypass, and entries age out. */
class ResultCacheSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def freshBase(): String = {
    val dir = Files.createTempDirectory("rc-base").toString
    Tables(spark, sf, "orders").limit(500)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(dir + "/t")
    dir + "/t"
  }

  private def query(base: String) =
    spark.read.parquet(base)
      .filter(col("o_totalprice") > 1000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))

  test("equivalent independently-built plans: first computes, second " +
    "hits, results identical") {
    val base = freshBase()
    val cache = Files.createTempDirectory("rc-cache").toString
    val r1 = ResultCache.withCache(spark, query(base), cache)
    assert(!r1.hit && r1.key.isDefined)
    val r2 = ResultCache.withCache(spark, query(base), cache)
    assert(r2.hit, "an equivalent plan over unchanged inputs must hit")
    assert(r2.key == r1.key)
    val direct = query(base).collect().map(_.toSeq).toSet
    assert(r2.df.collect().map(_.toSeq).toSet == direct)
    // exactly one published entry
    val entries = new java.io.File(cache).listFiles.filter(_.getName != "_SUCCESS")
      .filterNot(_.getName.startsWith(".tmp"))
    assert(entries.length == 1)
  }

  test("appending data to any input changes the key: stale serve is " +
    "impossible by construction") {
    val base = freshBase()
    val cache = Files.createTempDirectory("rc-cache").toString
    val r1 = ResultCache.withCache(spark, query(base), cache)
    // append more rows (new file in the scanned directory)
    Tables(spark, sf, "orders")
      .filter(col("o_orderkey") > 10000).limit(200)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("append").parquet(base)
    val r2 = ResultCache.withCache(spark, query(base), cache)
    assert(!r2.hit, "changed inputs must miss")
    assert(r2.key != r1.key)
    // and the recomputed result reflects the new data
    assert(r2.df.collect().map(_.toSeq).toSet ==
      query(base).collect().map(_.toSeq).toSet)
  }

  test("nondeterministic plans bypass the cache entirely") {
    val base = freshBase()
    val df = spark.read.parquet(base).withColumn("r", rand(42) * col("o_custkey"))
    assert(ResultCache.key(df).isEmpty)
    val cache = Files.createTempDirectory("rc-cache").toString
    val r = ResultCache.withCache(spark, df, cache)
    assert(!r.hit && r.key.isEmpty)
    assert(new java.io.File(cache).listFiles == null ||
      new java.io.File(cache).listFiles.isEmpty)
  }

  test("different queries over the same input get different entries") {
    val base = freshBase()
    val cache = Files.createTempDirectory("rc-cache").toString
    val k1 = ResultCache.withCache(spark, query(base), cache).key
    val other = spark.read.parquet(base)
      .groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("mx"))
    val k2 = ResultCache.withCache(spark, other, cache).key
    assert(k1.isDefined && k2.isDefined && k1 != k2)
  }

  test("composes with snapshot tables: hits while the version is " +
    "unchanged, misses after a new commit") {
    import graft.warehouse.Snapshots
    val dir = Files.createTempDirectory("rc-snap").toString + "/t"
    val cache = Files.createTempDirectory("rc-cache").toString
    val base = Tables(spark, sf, "orders").limit(300)
      .select(col("o_orderkey"), col("o_totalprice"))
    Snapshots.append(spark, dir, base)
    def agg() = Snapshots.read(spark, dir)
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("t"))
    val r1 = ResultCache.withCache(spark, agg(), cache)
    assert(!r1.hit && r1.key.isDefined)
    assert(ResultCache.withCache(spark, agg(), cache).hit)
    Snapshots.append(spark, dir,
      Tables(spark, sf, "orders").limit(100)
        .select(col("o_orderkey"), col("o_totalprice")))
    val r3 = ResultCache.withCache(spark, agg(), cache)
    assert(!r3.hit, "a new snapshot commit must invalidate")
    assert(r3.df.head.getLong(0) == 400L)
  }

  test("a scalar subquery's input is fingerprinted too: changing ONLY " +
    "the subquery-side table invalidates") {
    import spark.implicits._
    val base = freshBase()
    val thresholdDir = Files.createTempDirectory("rc-thresh").toString + "/t"
    Seq(1000.0).toDF("cut").write.parquet(thresholdDir)
    val cache = Files.createTempDirectory("rc-cache").toString
    def q() = {
      spark.read.parquet(base).createOrReplaceTempView("rc_orders")
      spark.read.parquet(thresholdDir).createOrReplaceTempView("rc_cut")
      spark.sql("""SELECT count(*) AS n FROM rc_orders
                   WHERE o_totalprice > (SELECT max(cut) FROM rc_cut)""")
    }
    val r1 = ResultCache.withCache(spark, q(), cache)
    assert(!r1.hit && r1.key.isDefined,
      "subquery plans must be fingerprintable, not bypass")
    assert(ResultCache.withCache(spark, q(), cache).hit)
    // append a new threshold row — the OUTER table is untouched
    Seq(50000.0).toDF("cut").write.mode("append").parquet(thresholdDir)
    val r3 = ResultCache.withCache(spark, q(), cache)
    assert(!r3.hit, "a subquery-side data change must invalidate")
    assert(r3.df.head.getLong(0) == q().collect().head.getLong(0))
  }

  test("vacuum drops aged entries and leaves fresh ones") {
    val base = freshBase()
    val cache = Files.createTempDirectory("rc-cache").toString
    ResultCache.withCache(spark, query(base), cache)
    assert(ResultCache.vacuum(spark, cache, maxAgeMs = 60000) == 0)
    assert(ResultCache.vacuum(spark, cache, maxAgeMs = 0) == 1)
    // entry gone -> next call recomputes
    assert(!ResultCache.withCache(spark, query(base), cache).hit)
  }
}
