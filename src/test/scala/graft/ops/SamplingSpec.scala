package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic sampling + the approx-percentile scale-path claim. */
class SamplingSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def events = spark.read.parquet(s"$dir/events.parquet")

  test("uniform: deterministic, complementary cuts partition the table") {
    val n = events.count()
    val in = Sampling.uniform(events, col("event_id"), 80)
    val out = events.where(TextOps.hashSplit(col("event_id"), 100) >= 80)
    assert(in.count() + out.count() == n)
    // rate lands near 80% (hash uniformity) and is identical across runs
    val c1 = in.count(); val c2 = Sampling.uniform(events, col("event_id"), 80).count()
    assert(c1 == c2)
    assert(math.abs(c1.toDouble / n - 0.8) < 0.05, s"rate ${c1.toDouble / n}")
  }

  test("stratified: per-stratum rates hold; rows never move between strata rates") {
    val rate = when(col("event_type") === "view", 10).otherwise(50)
    val sampled = Sampling.stratified(events, col("event_id"), rate)
    val rates = sampled.groupBy("event_type").count()
      .join(events.groupBy("event_type").count()
        .withColumnRenamed("count", "total"), "event_type")
      .select(col("event_type"), (col("count") / col("total")).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rates("view") - 0.10) < 0.05, rates.toString)
    for ((t, r) <- rates if t != "view") assert(math.abs(r - 0.50) < 0.07, s"$t=$r")
    // raising another stratum's rate must not change this stratum's members
    val viewIds = sampled.where(col("event_type") === "view")
      .select("event_id").collect().map(_.getLong(0)).toSet
    val rate2 = when(col("event_type") === "view", 10).otherwise(90)
    val viewIds2 = Sampling.stratified(events, col("event_id"), rate2)
      .where(col("event_type") === "view")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(viewIds == viewIds2)
  }

  test("approx_percentile (the 100 TB path) tracks the exact baseline") {
    // exact percentile is the verification baseline (q57); the scale path
    // is the mergeable sketch — assert it lands within its accuracy bound
    val both = events.agg(
      expr("percentile(value, 0.5D)").as("exact"),
      expr("approx_percentile(value, 0.5D, 1000)").as("approx"))
      .collect()(0)
    val (exact, approx) = (both.getDouble(0), both.getDouble(1))
    assert(math.abs(approx - exact) / math.max(exact, 1e-9) < 0.05,
      s"approx $approx vs exact $exact")
  }
}
