package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.olap.JsonProfile

class JsonProfileSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("flattens nested objects and arrays to dotted paths (P28)") {
    val df = Seq((1L, """{"a":{"b":[{"c":1},{"c":null}]},"d":"x"}""")).toDF("id", "js")
    val flat = df.select(JsonProfile.flattenJson(col("js")).as("f"))
      .select(explode(col("f"))).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(flat == Map("a.b.0.c" -> "1", "a.b.1.c" -> null, "d" -> "x"))
  }

  test("null-ish leaves: null, empty, 'null', 'none' (P28)") {
    val df = Seq(
      (1L, """{"a":null,"b":"","c":"NULL","d":"none","e":"ok"}"""),
      (2L, """{"x":"1"}"""),
      (3L, """not json"""),
      (4L, null.asInstanceOf[String])).toDF("id", "js")
    val p = JsonProfile.profile(df, "js", "id").orderBy("id").collect()
    assert(p(0).getAs[Long]("n_fields") == 5L && p(0).getAs[Long]("n_nullish") == 4L)
    assert(p(0).getAs[Double]("null_pct") == 80.0)
    assert(p(1).getAs[Double]("null_pct") == 0.0)
    // unparseable / missing JSON → fully bad row (100%)
    assert(p(2).getAs[Double]("null_pct") == 100.0)
    assert(p(3).getAs[Double]("null_pct") == 100.0)
  }
}
