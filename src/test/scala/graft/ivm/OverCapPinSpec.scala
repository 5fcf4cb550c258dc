package graft.ivm

import graft.SparkTestBase
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The ΔV refresh pin's over-cap path (`collectLocal(overCapPin = true)`):
  * an all-local frame that turns out OVER the local cap must be executed
  * exactly ONCE — the collected rows become the pin directly (a plain
  * LocalRelation) instead of being discarded and re-computed by the
  * cache()+count() fallback. */
class OverCapPinSpec extends AnyFunSuite with SparkTestBase {

  // all-local-leaf plan that does NOT constant-fold to a LocalRelation
  // (an aggregate blocks ConvertToLocalRelation), single-partition so the
  // driver-inline executor qualifies — the refresh-pin plan shape
  private def allLocalAgg(n: Int) = {
    val rows = (0 until n).map(i =>
      org.apache.spark.sql.catalyst.InternalRow(i, i.toLong))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("k INT, v BIGINT")
    org.apache.spark.sql.GraftTemplates.taggedLocal(spark, schema, rows)
      .coalesce(1).groupBy(col("k")).agg(sum(col("v")).as("sv"))
  }

  private def countingJobs[A](f: => A): (A, Int) = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val r = f
      // let any in-flight JobStart events drain before reading the counter
      Thread.sleep(300)
      (r, jobs.get())
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("over-cap all-local pin: one inline execution, zero jobs, rows kept") {
    // warm the plan-template cache: occurrence 1 marks the structure seen,
    // occurrence 2 compiles the template (in the AQE-free template session,
    // the only plan shape the driver-inline executor accepts) — the
    // engine's steady state for a repeated refresh-pin shape
    Ivm.collectLocal(allLocalAgg(100), cap = 10, overCapPin = true)
    Ivm.collectLocal(allLocalAgg(100), cap = 10, overCapPin = true)
    val df = allLocalAgg(100)
    val inline0 = org.apache.spark.sql.GraftTemplates.inlineRuns.get()
    val (res, jobs) = countingJobs {
      Ivm.collectLocal(df, cap = 10, overCapPin = true)
    }
    val inlineDelta =
      org.apache.spark.sql.GraftTemplates.inlineRuns.get() - inline0
    assert(res.isDefined, "over-cap pin must return the collected frame")
    assert(inlineDelta == 1, s"expected exactly 1 inline execution, got $inlineDelta")
    assert(jobs == 0, s"over-cap pin scheduled $jobs Spark jobs (expected 0)")
    // the pin is a plain (un-coalesced) LocalRelation holding ALL rows
    assert(res.get.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    assert(res.get.count() == 100)
  }

  test("within-cap results stay on the tagged-local path; non-pin callers keep None") {
    val small = Ivm.collectLocal(allLocalAgg(5), cap = 10, overCapPin = true)
    assert(small.isDefined && small.get.count() == 5)
    // non-pin callers (delta memos, cascade changelogs) keep the
    // None-on-over-cap contract so their smallness gating is unchanged
    assert(Ivm.collectLocal(allLocalAgg(100), cap = 10).isEmpty)
  }
}
