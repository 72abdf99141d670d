package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Star

class StarSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private lazy val orders = Tables(spark, sf, "orders")
  private lazy val lineitem = Tables(spark, sf, "lineitem")
  private lazy val customer = Tables(spark, sf, "customer")
  private lazy val nation = Tables(spark, sf, "nation")
  private lazy val region = Tables(spark, sf, "region")

  test("latestPerKey: one row per key (A8)") {
    val latest = Star.latestPerKey(orders, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
    assert(latest.count() == orders.select("o_custkey").distinct().count())
  }

  test("latestPerKey is idempotent (A8/A9)") {
    val once = Star.latestPerKey(orders, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
    val twice = Star.latestPerKey(once, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }

  test("latestPerKey picks the max version (A8)") {
    val latest = Star.latestPerKey(orders, Seq("o_custkey"), Seq("o_orderdate", "o_orderkey"))
    val maxDates = orders.groupBy("o_custkey").agg(max(col("o_orderdate")).as("md"))
    val joined = latest.join(maxDates, "o_custkey").filter(col("o_orderdate") =!= col("md"))
    assert(joined.count() == 0)
  }

  test("surrogate keys join identically to natural keys (P13/J3)") {
    val dim = Star.dimCustomer(customer)
    val fact = Star.factOrder(orders)
    val viaSk = fact.join(dim, "customer_sk").count()
    val viaNk = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
    assert(viaSk == viaNk)
  }

  test("surrogate keys are collision-free on the fixture key domain (P13)") {
    val n = customer.select("c_custkey").distinct().count()
    val nSk = Star.dimCustomer(customer).select("customer_sk").distinct().count()
    assert(n == nSk)
  }

  test("skNullIfZero nulls zero keys and keeps others (P14)") {
    val df = spark.range(0, 10).select(Star.skNullIfZero(col("id")).as("sk"), col("id"))
    val rows = df.collect()
    assert(rows.filter(_.getAs[Long]("id") == 0L).forall(_.isNullAt(0)))
    assert(rows.filter(_.getAs[Long]("id") != 0L).forall(!_.isNullAt(0)))
  }

  test("regionRevenue equals ungrouped revenue total (J1/J3)") {
    val agg = Star.regionRevenue(lineitem, orders, customer, nation, region)
      .agg(sum(col("revenue"))).head.getDouble(0)
    val flat = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).head.getDouble(0)
    assert(math.abs(agg - flat) < 1.0)
  }

  test("entry flagship returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
