package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench protocol's divergence-reference parser — the r19
  * fix: the check silently disabled itself when the parser assumed the
  * live sidecar's compact JSON and the committed BENCH_LOCAL files are
  * whitespace-normalized. */
class BenchProtocolSpec extends AnyFunSuite {
  test("parseRefTimes: compact sidecar form") {
    val txt = """{"metric":"total","value":1.0,"queries":{"q01_a":0.39,"q02_b":1.5e-1,"q03_fail":-2.0},"errors":{}}"""
    val m = Bench.parseRefTimes(txt)
    assert(m == Map("q01_a" -> 0.39, "q02_b" -> 0.15),
      s"failed entries dropped, rest parsed: $m")
  }
  test("parseRefTimes: whitespace-normalized committed form") {
    val txt = """{"metric": "total", "value": 1.0, "queries": {"q01_a": 0.39, "q02_b": 2.0}, "errors": {}}"""
    assert(Bench.parseRefTimes(txt) ==
      Map("q01_a" -> 0.39, "q02_b" -> 2.0))
  }
  test("parseRefTimes: the committed r19 artifact itself parses") {
    val src = scala.io.Source.fromFile("BENCH_LOCAL_r19.json")
    val txt = try src.mkString finally src.close()
    val m = Bench.parseRefTimes(txt)
    assert(m.size >= 250, s"${m.size} reference queries")
    assert(m.contains("q01_dup_gate") && m.values.forall(_ > 0.0))
  }
  test("parseRefTimes: no queries map parses to empty") {
    assert(Bench.parseRefTimes("""{"metric":"total"}""").isEmpty)
    assert(Bench.parseRefTimes("").isEmpty)
  }
  test("parseRefTimes: nested object inside queries does not truncate, and its inner fields do not leak") {
    // the r19 parser sliced at the FIRST '}', so a nested object lost
    // every entry after it; the depth-counting scan keeps them — and
    // harvests ONLY depth-1 pairs, so a nested object's inner fields
    // can't masquerade as reference entries
    val txt = """{"queries":{"q01_a":0.39,"q02_o":{"inner":1.0,"best":2.5},"q03_b":2.0}}"""
    val m = Bench.parseRefTimes(txt)
    assert(m == Map("q01_a" -> 0.39, "q03_b" -> 2.0),
      s"only depth-1 entries survive: $m")
  }
  test("parseRefTimes: brace inside a string value does not derail the scan") {
    val txt = """{"queries":{"q01_a":0.39},"errors":{"q9":"msg with } brace"},"queries_not":{}}"""
    assert(Bench.parseRefTimes(txt) == Map("q01_a" -> 0.39))
  }
  test("newestRef: numeric round order, not lexicographic") {
    val names = Seq("BENCH_LOCAL_r19.json", "BENCH_LOCAL_r100.json",
      "BENCH_LOCAL_r99.json", "BENCH_LOCAL_r08.json")
    assert(Bench.newestRef(names).contains("BENCH_LOCAL_r100.json"),
      "r100 beats r99 and r19 numerically")
    assert(Bench.newestRef(Seq("BENCH_LOCAL_r9.json", "BENCH_LOCAL_r19.json"))
      .contains("BENCH_LOCAL_r19.json"), "unpadded r9 < r19")
    assert(Bench.newestRef(Seq.empty).isEmpty)
  }
}
