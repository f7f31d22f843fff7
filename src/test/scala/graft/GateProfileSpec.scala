package graft

import org.scalatest.funsuite.AnyFunSuite

/** Phase-attribution canary for the crawl gate — the bench suite's
  * wall. Runs the declared l2_crawl_gate query at sf0.1 and prints
  * [[graft.streaming.Streams.gateLaps]], so a regression in any phase
  * (cuts, shells, probe planning, appends) is attributable from the
  * test log without re-instrumenting. The wall bound is deliberately
  * loose (shared JVM, parallel suites); the lap printout is the
  * signal. */
class GateProfileSpec extends AnyFunSuite with TestSpark {
  test("crawl gate completes with attributable phases at sf0.1") {
    graft.streaming.Streams.gateLaps.clear()
    // warm the session (first-job costs must not read as gate time)
    spark.range(8).count()
    val t0 = System.nanoTime()
    val result = SparkEntry.queries("l2_crawl_gate")(spark, "/root/testdata/sf0.1")
    val tBatches = (System.nanoTime() - t0) / 1e9
    result.write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    info(f"gate completion $wall%.2fs (batches $tBatches%.2fs, " +
      f"final read ${wall - tBatches}%.2fs)")
    var attributed = 0.0
    graft.streaming.Streams.gateLaps.forEach { case (b, p, s) =>
      info(f"batch $b  $p%-16s $s%6.2fs")
      if (p != "appends") attributed += s // appends lap spans append_*
    }
    assert(wall < 120.0, f"gate completion $wall%.2fs — investigate laps")
    assert(attributed > 0.0, "laps must attribute the gate's phases")
  }
}
