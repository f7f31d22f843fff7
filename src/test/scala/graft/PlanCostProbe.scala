package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Throwaway measurement probe (not an assertion suite): attributes
  * the fixed per-plan cost seen in the crawl gate's laps — stock
  * Catalyst vs graft's injected optimizer rules. Prints timings via
  * info(); the only assert is that planning succeeds. */
class PlanCostProbe extends AnyFunSuite with TestSpark {
  test("per-plan fixed cost: rules on vs off") {
    // an ISOLATED session (own SQLConf, shared context): the probe
    // toggles six rule switches over a long window, and the shared
    // session would leak the off-state into concurrently-running
    // suites' plan-shape asserts (review finding)
    val probe = TestSpark.session.newSession()
    val df = probe.read.parquet(s"$sf/lineitem.parquet")
    // warm everything once
    df.groupBy("l_returnflag").count().queryExecution.executedPlan
    def time(n: Int)(mk: Int => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      (0 until n).foreach(i => mk(i).queryExecution.executedPlan)
      (System.nanoTime() - t0) / 1e9 / n
    }
    def shape(i: Int) = df.filter(col("l_orderkey") > lit(i))
      .groupBy(col("l_returnflag"))
      .agg(max(col("l_quantity")).as("m"), count(lit(1)).as("n"))
    val withRules = time(20)(shape)
    val offs = Seq("spark.graft.branchFilePruning.enabled",
      "spark.graft.dpp.enabled", "spark.graft.formatBranching.enabled",
      "spark.graft.fk.joinElim", "spark.graft.mv.autoRewrite",
      "spark.graft.statsAgg")
    offs.foreach(k => probe.conf.set(k, "false"))
    val withoutRules =
      try time(20)(shape)
      finally offs.foreach(k => probe.conf.unset(k))
    info(f"per-plan: rules ON $withRules%.4fs, OFF $withoutRules%.4fs")
    // per-rule attribution: turn each off alone
    offs.foreach { k =>
      probe.conf.set(k, "false")
      val t = try time(10)(shape) finally probe.conf.unset(k)
      info(f"  without $k%-44s $t%.4fs")
    }
    assert(withRules > 0)
  }
}
