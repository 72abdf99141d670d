package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RewriteLatestPerKey optimizer rule (graft.plans): the row_number()=1
  * window idiom must plan as a max_by/min_by aggregate — and only under
  * the rule's conservative guards. Results are compared against the
  * un-extended session (TestSpark.spark) on the same input.
  */
class RewriteSpec extends AnyFunSuite {

  // A second session on the same SparkContext, WITH the graft extensions
  // (TestSpark.spark deliberately has none, so it is the control).
  private lazy val extSpark: SparkSession = {
    val base = TestSpark.spark // ensure the context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    // restore the shared session as default so other suites are unaffected
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def latestQuery(s: SparkSession): DataFrame = {
    val orders = Tables(s, TestSpark.sf, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
  }

  test("row_number()=1 plans as an aggregate with partial max_by, no Window") {
    val df = latestQuery(extSpark)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window survived the rewrite:\n" + plan)
    assert(plan.contains("partial_max_by"), "no map-side partial max_by:\n" + plan)
  }

  test("rewritten results equal the window formulation's results") {
    val expect = latestQuery(TestSpark.spark)
    val plain = expect.queryExecution.executedPlan.toString
    assert(plain.contains("Window"), "control session unexpectedly rewrote:\n" + plain)
    // (o_custkey, o_orderdate, o_orderkey) is a total order per customer
    // (orderkey unique), so both formulations are deterministic here
    assert(latestQuery(extSpark).exceptAll(expect).count() == 0)
    assert(expect.exceptAll(latestQuery(extSpark)).count() == 0)
  }

  test("ascending order rewrites to min_by (earliest per key)") {
    val orders = Tables(extSpark, TestSpark.sf, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min_by"), plan)
  }

  test("row_number()<=k plans as the TopKRows heap aggregate, no Window") {
    val orders = Tables(extSpark, TestSpark.sf, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "window survived the rewrite:\n" + plan)
    assert(plan.contains("graft_topk_rows"), "no TopKRows aggregate:\n" + plan)
    assert(plan.contains("partial_graft_topk_rows"),
      "no map-side partial heap:\n" + plan)
  }

  test("top-k rewrite equals the window formulation, ranks included") {
    def topk(s: SparkSession): DataFrame = {
      val orders = Tables(s, TestSpark.sf, "orders")
      // (o_orderdate, o_orderkey) is a total order per customer, so both
      // formulations are deterministic, rank column included
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_orderdate", "rn")
    }
    val expect = topk(TestSpark.spark)
    assert(expect.queryExecution.executedPlan.toString.contains("Window"))
    val got = topk(extSpark)
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    assert(got.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(got).count() == 0)
    // several rn bounds conjoin to the tightest
    val orders = Tables(extSpark, TestSpark.sf, "orders")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    val tight = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("rn") <= 2)
    assert(!tight.queryExecution.executedPlan.toString.contains("Window"))
    val control = Tables(TestSpark.spark, TestSpark.sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5 && col("rn") <= 2)
    assert(tight.count() == control.count())
  }

  test("top-k rewrite ranks null order keys like the window formulation") {
    def data(s: SparkSession): DataFrame = {
      import s.implicits._
      Seq[(Long, java.lang.Long, String)](
        (1L, 10L, "a"), (1L, null, "b"), (1L, 7L, "c"),
        (2L, null, "d"), (2L, null, "e"),
        (3L, 5L, "f"))
        .toDF("k", "version", "payload")
    }
    def top2(s: SparkSession): DataFrame = {
      val w = Window.partitionBy("k")
        .orderBy(col("version").desc, col("payload").desc)
      data(s).withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    }
    val rewritten = top2(extSpark)
    rewritten.collect()
    assert(!rewritten.queryExecution.executedPlan.toString.contains("Window"))
    val control = top2(TestSpark.spark)
    assert(control.queryExecution.executedPlan.toString.contains("Window"))
    assert(rewritten.exceptAll(control).count() == 0)
    assert(control.exceptAll(rewritten).count() == 0)
  }

  test("guards hold: rank(), rn=k for k>1, non-default null ordering, " +
    "mixed directions are NOT rewritten") {
    val orders = Tables(extSpark, TestSpark.sf, "orders")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)

    // rn = 2 selects ONLY rank 2 — not a top-k; must keep the window
    val eq2 = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 2)
    eq2.collect()
    assert(eq2.queryExecution.executedPlan.toString.contains("Window"))

    // pagination-scale k: the heap would hold k rows per group in memory,
    // so beyond MaxK the spillable window sort must be kept
    val bigK = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100000)
    bigK.collect()
    assert(bigK.queryExecution.executedPlan.toString.contains("Window"))

    val rk = orders.withColumn("rk", rank().over(w)).filter(col("rk") === 1)
    rk.collect()
    assert(rk.queryExecution.executedPlan.toString.contains("Window"))

    // non-default null ordering → keep the window
    val wNullsFirst = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderkey").desc_nulls_first)
    val nf = orders.withColumn("rn", row_number().over(wNullsFirst))
      .filter(col("rn") === 1)
    nf.collect()
    assert(nf.queryExecution.executedPlan.toString.contains("Window"))

    val wMixed = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
    val mx = orders.withColumn("rn", row_number().over(wMixed))
      .filter(col("rn") === 1)
    mx.collect()
    assert(mx.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("null order keys rank exactly like the window formulation") {
    // groups with mixed null/non-null versions AND an all-null group —
    // max_by would silently skip/null these without the isnotnull wrap
    def data(s: SparkSession): DataFrame = {
      import s.implicits._
      Seq[(Long, java.lang.Long, String)](
        (1L, 10L, "a"), (1L, null, "b"), (1L, 7L, "c"),
        (2L, null, "d"), (2L, null, "e"),
        (3L, 5L, "f"))
        .toDF("k", "version", "payload")
    }
    def latest(s: SparkSession): DataFrame = {
      val w = Window.partitionBy("k")
        .orderBy(col("version").desc, col("payload").desc)
      data(s).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    }
    val rewritten = latest(extSpark)
    rewritten.collect()
    assert(!rewritten.queryExecution.executedPlan.toString.contains("Window"))
    val control = latest(TestSpark.spark)
    assert(control.queryExecution.executedPlan.toString.contains("Window"))
    assert(rewritten.exceptAll(control).count() == 0)
    assert(control.exceptAll(rewritten).count() == 0)
  }

  test("residual predicates survive on top of the rewrite") {
    val orders = Tables(extSpark, TestSpark.sf, "orders")
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey").desc)
    val df = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("o_totalprice") > 1000.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val control = Tables(TestSpark.spark, TestSpark.sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("o_totalprice") > 1000.0)
    assert(df.count() == control.count())
  }
}
