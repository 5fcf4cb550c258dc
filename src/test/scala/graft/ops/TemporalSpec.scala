package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite with SparkTestBase {

  test("asOfJoin picks the latest right row at or before each left row") {
    val left = df("k STRING, ts BIGINT, lv INT", Seq(
      Row("a", 100L, 1), Row("a", 50L, 2), Row("a", 10L, 3),
      Row("b", 100L, 4), Row(null, 100L, 5)))
    val right = df("k STRING, ts BIGINT, rv INT", Seq(
      Row("a", 20L, 20), Row("a", 50L, 50), Row("a", 99L, 99),
      Row("c", 10L, 7), Row(null, 40L, 8)))
    val got = Temporal.asOfJoin(left, right, Seq("k"), "ts", "ts", Seq("rv"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getInt(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Int]))).toSet
    val some = (x: String) => Option(x)
    assert(got == Set(
      (some("a"), 100L, 1, Some(99L), 3L, Some(99)),
      (some("a"), 50L, 2, Some(50L), 2L, Some(50)), // inclusive: ts == rts
      (some("a"), 10L, 3, None, 0L, None),          // nothing precedes
      (some("b"), 100L, 4, None, 0L, None),         // no right rows for key
      (Option.empty[String], 100L, 5, Some(40L), 1L, Some(8)))) // null key groups
  }

  test("rangeJoin pairs points with containing intervals across chunk borders") {
    val points = df("pid INT, ts BIGINT", Seq(
      Row(1, 100L), Row(2, 1000L), Row(3, 5000L)))
    // i10 covers [90,190] (crosses the chunk-100 border), i20 covers
    // [995,1000] (point sits exactly on the inclusive end)
    val ivs = df("iid INT, s BIGINT, e BIGINT", Seq(
      Row(10, 90L, 190L), Row(20, 995L, 1000L), Row(30, 101L, 200L)))
    val got = Temporal.rangeJoin(points, ivs, "ts", "s", "e", chunk = 100L)
      .select("pid", "r_iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 10), (2, 20)))
    // left join keeps pointless points with null interval columns
    val lj = Temporal.rangeJoin(points, ivs, "ts", "s", "e", chunk = 100L,
      joinType = "left")
    val byPid = lj.groupBy("pid").agg(count(col("r_iid")).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(byPid == Map(1 -> 1L, 2 -> 1L, 3 -> 0L))
  }

  test("rangeJoin with keys matches only same-key intervals, null-safely") {
    val points = df("k STRING, ts BIGINT", Seq(
      Row("a", 10L), Row("b", 10L), Row(null, 10L)))
    val ivs = df("k STRING, s BIGINT, e BIGINT, tag INT", Seq(
      Row("a", 0L, 20L, 1), Row("x", 0L, 20L, 2), Row(null, 5L, 15L, 3)))
    val got = Temporal.rangeJoin(points, ivs, "ts", "s", "e", chunk = 100L,
      keys = Seq("k")).select("k", "r_tag").collect()
      .map(r => (Option(r.getString(0)), r.getInt(1))).toSet
    assert(got == Set((Option("a"), 1), (Option.empty[String], 3)))
  }
}
