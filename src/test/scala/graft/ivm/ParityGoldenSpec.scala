package graft.ivm

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's four sqllogictest files, re-expressed row for row
  * (reference tests/ivm.test, tests/ivm_groupby.test, tests/ivm_filter.test,
  * tests/ivm_issue2.test). Multiplicity semantics must match exactly:
  * one delta_V row per (group, ±), insert/delete sides never merged. */
class ParityGoldenSpec extends AnyFunSuite with SparkTestBase {
  import AggSpec._

  private def register(name: String, d: org.apache.spark.sql.DataFrame): Unit =
    d.createOrReplaceTempView(name)

  // ------------------------------------------------ tests/ivm.test fixtures
  private def ivmTestFixtures(extraDelta: Boolean): Unit = {
    register("hello", df("a INT, b STRING, c STRING",
      Seq(Row(3, "true", "blah"), Row(4, "false", "foo"))))
    val base = Seq(
      Row(1, "k", "Mark", true),
      Row(2, "k", "Hannes", false))
    val rows = if (extraDelta) base :+ Row(5, "true", "Kriti", true) else base
    register("delta_hello",
      df(s"a INT, b STRING, c STRING, ${IvmCore.MULT} BOOLEAN", rows))
  }

  test("ivm.test: SELECT * passthrough (reference tests/ivm.test:29-35)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t1", Scan("hello"))
    assertRows(Ivm.upsert(spark, "t1"), Set(
      Seq(1, "k", "Mark", true),
      Seq(2, "k", "Hannes", false)))
  }

  test("upsert(persist=true) creates a real delta_<view> catalog table " +
      "(reference ivm_extension.cpp:100-103)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t1p", Scan("hello"))
    val want = Set(
      Seq[Any](1, "k", "Mark", true),
      Seq[Any](2, "k", "Hannes", false))
    assertRows(Ivm.upsert(spark, "t1p", persist = true), want)
    // read-back goes through the CATALOG (not a temp view): the table must
    // exist as a persisted managed table, like the reference's PRAGMA
    assert(spark.catalog.tableExists("delta_t1p"))
    assert(!spark.catalog.getTable("delta_t1p").isTemporary)
    assertRows(spark.table("delta_t1p"), want)
    spark.sql("DROP TABLE delta_t1p")
  }

  test("ivm.test: filtered agg (tests/ivm.test:47-52)") {
    ivmTestFixtures(extraDelta = true)
    Ivm.createView("t2", Project(
      Aggregate(Filter(Scan("hello"), col("b") === "true"),
        Seq("b"), Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))),
      Seq(col("sum_a"), col("count_c"), col("b"))))
    assertRows(Ivm.upsert(spark, "t2"), Set(Seq(5, 1, "true", true)))
  }

  test("ivm.test: filtered agg with no matching delta rows is empty (tests/ivm.test:64-70)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t3", Aggregate(Filter(Scan("hello"), col("b") === "true"),
      Seq("b"), Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))))
    assert(Ivm.upsert(spark, "t3").count() === 0)
  }

  test("ivm.test: group-by agg (tests/ivm.test:76-82)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t4", Aggregate(Scan("hello"),
      Seq("b"), Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))))
    assertRows(Ivm.upsert(spark, "t4"), Set(
      Seq("k", 1, 1, true),
      Seq("k", 2, 1, false)))
  }

  test("ivm.test: projection (tests/ivm.test:91-97)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t5", Project(Scan("hello"), Seq(col("a"), col("b"))))
    assertRows(Ivm.upsert(spark, "t5"), Set(
      Seq(1, "k", true), Seq(2, "k", false)))
  }

  test("ivm.test: filter a>0 (tests/ivm.test:106-112)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t6",
      Project(Filter(Scan("hello"), col("a") > 0), Seq(col("a"), col("b"))))
    assertRows(Ivm.upsert(spark, "t6"), Set(
      Seq(1, "k", true), Seq(2, "k", false)))
  }

  test("ivm.test: AND filter with empty BASE result works here (fixes reference README.md:38-39 bug; tests/ivm.test:121-124 expects an error)") {
    ivmTestFixtures(extraDelta = false)
    // The reference throws because the base query returns zero rows
    // (upstream issue #10). Our delta transform never consults the base, so
    // the correct delta rows come out.
    Ivm.createView("t7", Project(
      Filter(Scan("hello"), col("a") > 0 && col("c") === "Hannes"),
      Seq(col("a"), col("b"))))
    assertRows(Ivm.upsert(spark, "t7"), Set(Seq(2, "k", false)))
  }

  test("ivm.test: AND filter matching no delta rows → empty (tests/ivm.test:133-138)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t8", Project(
      Filter(Scan("hello"), col("a") > 0 && col("c") === "foo"),
      Seq(col("a"), col("b"))))
    assert(Ivm.upsert(spark, "t8").count() === 0)
  }

  test("ivm.test: global aggregate groups by multiplicity alone (tests/ivm.test:146-152)") {
    ivmTestFixtures(extraDelta = false)
    Ivm.createView("t9", Aggregate(Scan("hello"), Seq.empty,
      Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))))
    assertRows(Ivm.upsert(spark, "t9"), Set(
      Seq(1, 1, true), Seq(2, 1, false)))
  }

  // ------------------------------------------------- tests/ivm_groupby.test

  test("ivm_groupby.test: SUM of expression (tests/ivm_groupby.test:14,25-29)") {
    register("hello", df("a INT, b INT", Seq.empty))
    register("delta_hello", df(s"a INT, b INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row(11, 22, true), Row(13, 22, true), Row(12, 21, true))))
    Ivm.createView("g1", Aggregate(Scan("hello"), Seq("b"),
      Seq(Sum(col("a"), "sum_a"), Sum(col("a") + 2, "sum_a2"))))
    assertRows(Ivm.upsert(spark, "g1"), Set(
      Seq(22, 24, 28, true),
      Seq(21, 12, 14, true)))
  }

  // -------------------------------------------------- tests/ivm_filter.test

  private def filterFixtures(): Unit = {
    register("hello", df("a INT, b STRING, c STRING, d BOOLEAN",
      Seq(Row(3, "key", "blah", true), Row(4, "lock", "foo", false))))
    register("delta_hello",
      df(s"a INT, b STRING, c STRING, d BOOLEAN, ${IvmCore.MULT} BOOLEAN", Seq(
        Row(1, "key", "Mark", true, true),
        Row(2, "key", "Hannes", false, false),
        Row(3, "key", "Kriti", false, true))))
  }

  private def filterView(pred: org.apache.spark.sql.Column) = Project(
    Aggregate(Filter(Scan("hello"), pred), Seq("b", "d"),
      Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))),
    Seq(col("sum_a"), col("count_c"), col("b"), col("d")))

  test("ivm_filter.test: AND predicate, no delta match (tests/ivm_filter.test:29-34)") {
    filterFixtures()
    Ivm.createView("f1", filterView(col("b") === "lock" && col("d") === true))
    assert(Ivm.upsert(spark, "f1").count() === 0)
  }

  test("ivm_filter.test: AND predicate (tests/ivm_filter.test:42-47)") {
    filterFixtures()
    Ivm.createView("f2", filterView(col("b") === "key" && col("d") === true))
    assertRows(Ivm.upsert(spark, "f2"), Set(Seq(1, 1, "key", true, true)))
  }

  test("ivm_filter.test: OR predicate (tests/ivm_filter.test:56-63)") {
    filterFixtures()
    Ivm.createView("f3", filterView(col("b") === "key" || col("d") === true))
    assertRows(Ivm.upsert(spark, "f3"), Set(
      Seq(1, 1, "key", true, true),
      Seq(2, 1, "key", false, false),
      Seq(3, 1, "key", false, true)))
  }

  test("ivm_filter.test: same group key under both multiplicities (tests/ivm_filter.test:72-78)") {
    filterFixtures()
    Ivm.createView("f4", Project(
      Aggregate(Filter(Scan("hello"), col("b") === "key"), Seq("b"),
        Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))),
      Seq(col("sum_a"), col("count_c"), col("b"))))
    assertRows(Ivm.upsert(spark, "f4"), Set(
      Seq(4, 2, "key", true),
      Seq(2, 1, "key", false)))
  }

  // -------------------------------------------------- tests/ivm_issue2.test

  test("ivm_issue2.test: mixed insert+delete deltas across groups (tests/ivm_issue2.test:22-26)") {
    register("hello", df("a INT, b INT, c STRING", Seq.empty))
    register("delta_hello", df(s"a INT, b INT, c STRING, ${IvmCore.MULT} BOOLEAN",
      Seq(Row(1, 1, "Mark", true), Row(2, 2, "Hannes", false),
        Row(3, 2, "Kriti", false))))
    Ivm.createView("i1", Project(
      Aggregate(Scan("hello"), Seq("b"),
        Seq(Sum(col("a"), "sum_a"), Count(col("c"), "count_c"))),
      Seq(col("sum_a"), col("count_c"), col("b"))))
    assertRows(Ivm.upsert(spark, "i1"), Set(
      Seq(1, 1, 1, true),
      Seq(5, 2, 2, false)))
  }

  // ------------------------------------------------------- error parity

  test("missing delta table errors like the reference (ivm_rewrite_rule.hpp:112-116)") {
    register("lonely", df("a INT", Seq(Row(1))))
    spark.catalog.dropTempView("delta_lonely")
    Ivm.createView("e1", Scan("lonely"))
    val e = intercept[IllegalStateException](Ivm.upsert(spark, "e1"))
    assert(e.getMessage.contains("delta_lonely"))
  }
}
