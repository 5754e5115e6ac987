package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's one driver-facing contract: the captured stdout
  * line must round-trip through a strict JSON parser and stay inside
  * the driver's ~2000-char tail-capture budget AT THE REAL REGISTRY
  * SIZE. Round 15's line carried a 19-name `unstable` list next to the
  * slowest-40 map; the driver's parser returned null and the whole
  * round's PERF table came back empty (PERF_r16 `n_common: 0`). The
  * worst case constructed here is strictly harder than any real run:
  * the 40 LONGEST registered query names, every value three digits,
  * and an unstable list drawn from the longest names with the count at
  * the full registry size. */
class BenchLineSpec extends AnyFunSuite {

  private def parse(line: String): com.fasterxml.jackson.databind.JsonNode = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // strict: any trailing garbage or truncation must fail the test
    m.readTree(line)
  }

  test("captured stdout line parses and fits the capture budget at " +
      "registry size with worst-case names") {
    val names = SparkEntry.queries.keySet.toSeq
    assert(names.size >= 300, "registry unexpectedly small")
    val longest = names.sortBy(n => (-n.length, n))
    val top = longest.take(40).map(_ -> 999.99)
    val unstable = longest.take(Bench.UnstableCap + 25).sorted
    val line = Bench.stdoutLine(total = 9999.999, queries = top,
      unstable = unstable, fullPtr = true, sfDir = "/root/testdata/sf0.1")
    val node = parse(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("value").asDouble == 9999.999)
    assert(node.get("queries").size == 40)
    assert(node.get("unstable").size == Bench.UnstableCap)
    assert(node.get("unstable_n").asInt == unstable.size)
    assert(node.get("queries_full").asText == "BENCH_FULL.json")
    assert(node.get("sf").asText == "/root/testdata/sf0.1")
    // the driver's tail capture historically truncated near 2000 chars;
    // leave real headroom so name growth can't silently cross it
    assert(line.length <= 1900,
      s"captured line too long: ${line.length} chars\n$line")
  }

  test("full line (BENCH_LATEST form) parses with every query present") {
    val names = SparkEntry.queries.keySet.toSeq.sorted
    val line = Bench.stdoutLine(total = 123.456,
      queries = names.map(_ -> 1.23), unstable = Nil, fullPtr = false,
      sfDir = "/root/testdata/sf0.1", withUnstable = false)
    val node = parse(line)
    assert(node.get("queries").size == names.size)
    assert(!node.has("unstable"))
  }
}
