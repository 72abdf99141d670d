package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Checks
import graft.warehouse.Checks._

/** Data-quality constraint suite: per-constraint verdict semantics (null
  * exemptions, FK null handling, duplicate counting), the one-scan plan
  * for row-level checks, and the broadcast FK probe. */
class ChecksSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  //  id | v     | s    | fk
  //   1 | 10.0  | A    | 100
  //   2 | 99.0  | B    | 200   <- range + set violations
  //   3 | null  | A    | null  <- null v (range-exempt), null fk (FK-exempt)
  //   4 | 20.0  | null | 300   <- null s (set-exempt), fk 300 missing in dim
  //   4 | 20.0  | A    | 100   <- duplicate id
  private lazy val df = Seq(
    (Some(1L), Some(10.0), Some("A"), Some(100L)),
    (Some(2L), Some(99.0), Some("B"), Some(200L)),
    (Some(3L), None, Some("A"), None),
    (Some(4L), Some(20.0), None, Some(300L)),
    (Some(4L), Some(20.0), Some("A"), Some(100L))
  ).toDF("id", "v", "s", "fk")
  private lazy val dim = Seq(100L, 200L, 200L).toDF("k")

  private def report = Checks.check(df, Seq(
    NotNull("v"),
    InRange("v", 0.0, 50.0),
    InSet("s", Seq("A")),
    Satisfies("v_under_30", col("v") < 30.0),
    Unique(Seq("id")),
    RefIntegrity("fk", dim, "k")))

  test("verdict semantics: typed checks exempt NULLs, satisfies counts them") {
    val rows = report.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(rows("not_null:v") == ((1L, 5L, false)))
    // only row 2 (99.0) is out of range; row 3's NULL is exempt
    assert(rows("range:v[0.0,50.0]") == ((1L, 5L, false)))
    // only row 2 ('B'); row 4's NULL is exempt
    assert(rows("set:s{A}") == ((1L, 5L, false)))
    // 99.0 fails, NULL v is un-evaluable -> also a violation
    assert(rows("satisfies:v_under_30") == ((2L, 5L, false)))
    // both id=4 rows count (rows you would quarantine)
    assert(rows("unique:id") == ((2L, 5L, false)))
    // fk=300 missing; fk NULL exempt; dup dim key 200 is NOT a violation
    assert(rows("ref:fk") == ((1L, 5L, false)))
  }

  test("passing table: all-zero violations, pass=true everywhere") {
    val clean = Seq((1L, 5.0, "A", 100L), (2L, 6.0, "A", 200L))
      .toDF("id", "v", "s", "fk")
    val rep = Checks.check(clean, Seq(
      NotNull("v"), InRange("v", 0.0, 50.0), InSet("s", Seq("A")),
      Unique(Seq("id")), RefIntegrity("fk", dim, "k"))).collect()
    assert(rep.length == 5)
    assert(rep.forall(r => r.getLong(1) == 0L && r.getBoolean(3)))
    assert(rep.forall(_.getLong(2) == 2L))
  }

  test("unique groups NULL key components together (GROUP BY semantics)") {
    val d = Seq(Option.empty[Long], Option.empty[Long], Some(1L)).toDF("id")
    val rep = Checks.check(d, Seq(Unique(Seq("id")))).collect()
    assert(rep.head.getLong(1) == 2L)
  }

  test("multi-column unique key") {
    val d = Seq((1L, 1L), (1L, 2L), (1L, 2L)).toDF("a", "b")
    val rep = Checks.check(d, Seq(Unique(Seq("a", "b")))).collect()
    assert(rep.head.getLong(1) == 2L)
  }

  test("duplicate constraint names are rejected") {
    intercept[IllegalArgumentException] {
      Checks.check(df, Seq(NotNull("v"), NotNull("v")))
    }
  }

  test("row-level checks run in ONE aggregate over one scan") {
    // file-backed table: in-memory fixtures constant-fold to
    // LocalTableScan and hide the plan shape (NOTES lesson 29)
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val rep = Checks.check(li, Seq(
      NotNull("l_returnflag"),
      InRange("l_quantity", 1.0, 45.0),
      Satisfies("disc", col("l_discount") <= 0.08)))
    val plan = rep.queryExecution.executedPlan.toString
    // one scan feeding one aggregate pair (partial+final); no join
    val scans = "FileScan|Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected 1 scan, plan:\n$plan")
    assert(!plan.contains("Join"), s"row-level checks must not join:\n$plan")
  }

  test("FK probe broadcasts the dim key set (fact side never shuffles for the join)") {
    val li = Tables(spark, TestSpark.sf, "lineitem")
    val ord = Tables(spark, TestSpark.sf, "orders")
    val rep = Checks.check(li, Seq(RefIntegrity("l_orderkey", ord, "o_orderkey")))
    val plan = rep.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast FK probe:\n$plan")
    val rows = rep.collect()
    assert(rows.head.getLong(1) == 0L) // every lineitem key has an order
  }
}
