package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench tool's regression-attribution guard: baseline parsing must
  * read both artifact shapes (Bench stdout, the driver's escaped-`tail`
  * wrapper) and never mistake envelope keys for query times. */
class BenchSpec extends AnyFunSuite {

  test("parseBaseline reads Bench stdout and the driver wrapper, skipping " +
    "envelope keys") {
    val stdout =
      """{"metric":"total","value":66.0,"unit":"sec","queries":{"q01_count_by_type":0.18,"x111_incremental_mv":3.7},"retimed":[],"repeat":2,"single_pass_total":68.125,"sf":"/d"}"""
    assert(Bench.parseBaseline(stdout) ==
      Map("q01_count_by_type" -> 0.18, "x111_incremental_mv" -> 3.7))
    // the driver wrapper: numeric envelope keys + an ESCAPED tail
    val wrapper =
      """{"n": 7, "rc": 0, "cpus": 32, "sf": 0.1,
        | "tail": "s\":0.17,\"x46_anomaly_score\":0.178,\"x47_leakproof_split\":0.379",
        | "parsed": {"metric": "total", "value": 66.0, "n_queries": 177}}""".stripMargin
    val got = Bench.parseBaseline(wrapper)
    assert(got == Map("x46_anomaly_score" -> 0.178,
      "x47_leakproof_split" -> 0.379), got.toString)
    // truncated leading fragment (s\":0.17) must not produce a bogus key
    assert(!got.contains("s"))
    assert(Bench.parseBaseline("") == Map.empty)
    // the real prior-round artifact parses to a non-trivial map
    val f = new java.io.File("BENCH_r07.json")
    if (f.isFile) {
      val src = scala.io.Source.fromFile(f)
      val real = try Bench.parseBaseline(src.mkString) finally src.close()
      assert(real.size > 20 && real.values.forall(v => v > 0 && v < 600), real.size.toString)
    }
  }
}
