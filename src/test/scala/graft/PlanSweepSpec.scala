package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan hygiene: EVERY query in the SparkEntry surface must
  * plan without a CartesianProduct — the one physical operator that is
  * never acceptable at 100 TB (a BroadcastNestedLoopJoin against a
  * 1-row/stats frame is fine and common; an unbounded cartesian is
  * not). This sweep is the backstop behind PlanSpec's targeted gates:
  * any FUTURE query added to the surface gets the check for free. */
class PlanSweepSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("no query in the whole surface plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, sf)
          df.collect() // finalize AQE
          val p = df.queryExecution.executedPlan.toString
          if (p.contains("CartesianProduct")) Some(name) else None
        } catch {
          case e: Exception => Some(s"$name (failed to run: ${e.getMessage.take(80)})")
        }
    }
    assert(offenders.isEmpty,
      s"queries with cartesian products or failures: ${offenders.mkString(", ")}")
  }
}
