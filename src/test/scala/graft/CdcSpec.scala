package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.warehouse.Cdc

/** MERGE-INTO semantics of Cdc.applyChanges: per-op verdicts, version
  * ordering against the snapshot, delete/re-insert chains, schema
  * guards, and the no-window plan shape. */
class CdcSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private lazy val snap = Seq(
    (1L, "a", 0L), (2L, "b", 0L), (3L, "c", 5L)
  ).toDF("k", "payload", "v")

  test("insert, update and delete verdicts in one apply") {
    val changes = Seq(
      (2L, "b2", 1L, "U"),   // update existing
      (3L, "dead", 6L, "D"), // delete existing
      (9L, "new", 1L, "I")   // insert new key
    ).toDF("k", "payload", "v", "op")
    val got = Cdc.applyChanges(snap, changes, Seq("k"), Seq("v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(1L -> "a", 2L -> "b2", 9L -> "new"))
  }

  test("a change OLDER than the snapshot version loses (late-arriving CDC)") {
    val stale = Seq((3L, "old", 4L, "U"), (3L, "gone", 3L, "D"))
      .toDF("k", "payload", "v", "op")
    val got = Cdc.applyChanges(snap, stale, Seq("k"), Seq("v"))
      .filter($"k" === 3L).collect()
    assert(got.length == 1 && got(0).getString(1) == "c" && got(0).getLong(2) == 5L)
  }

  test("delete then re-insert at a higher version resurrects the key") {
    val changes = Seq((1L, "x", 1L, "D"), (1L, "back", 2L, "I"))
      .toDF("k", "payload", "v", "op")
    val got = Cdc.applyChanges(snap, changes, Seq("k"), Seq("v"))
      .filter($"k" === 1L).collect()
    assert(got.length == 1 && got(0).getString(1) == "back")
  }

  test("schema guards: missing op, op on snapshot, column mismatch") {
    val ch = Seq((1L, "x", 1L, "U")).toDF("k", "payload", "v", "op")
    assertThrows[IllegalArgumentException] {
      Cdc.applyChanges(snap, ch.drop("op"), Seq("k"), Seq("v"))
    }
    assertThrows[IllegalArgumentException] {
      Cdc.applyChanges(snap.withColumn("op", lit("I")), ch, Seq("k"), Seq("v"))
    }
    assertThrows[IllegalArgumentException] {
      Cdc.applyChanges(snap.drop("payload"), ch, Seq("k"), Seq("v"))
    }
  }

  test("plan: one partial max_by aggregate on one exchange, no window") {
    val ch = Seq((1L, "x", 1L, "U")).toDF("k", "payload", "v", "op")
    val df = Cdc.applyChanges(snap, ch, Seq("k"), Seq("v"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("partial_max_by"), "must partial-aggregate map-side:\n" + p)
    // struct-valued max_by plans as SortAggregate — its LOCAL sorts are
    // fine; what must not appear is a Window or a second exchange
    assert(!p.contains("Window"), "no window in the collapse:\n" + p)
    assert("Exchange".r.findAllIn(p).size == 1,
      "exactly the one keyed exchange:\n" + p)
  }
}
