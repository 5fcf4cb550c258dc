package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `auxExprKey` decides which MIN/MAX/COUNT-DISTINCT specs share one
  * auxiliary (group, value) multiset. The key must be STRUCTURAL: equal
  * for the same tracked expression built at different call sites, and
  * unequal whenever the expressions differ — including when the only
  * difference lives inside a user string literal that happens to look
  * like an object hash (`@beef`) or an ExprId (`#1`), which a textual
  * strip would erase into a collision that corrupts both specs' results. */
class AuxKeySpec extends AnyFunSuite with SparkTestBase {

  private def key(a: AggSpec) = AggSpec.auxExprKey(a)

  test("same structure from different construction sites → one key") {
    def site1 = Min(upper(col("tag")), "m1")
    def site2 = Min(upper(col("tag")), "m2")
    assert(key(site1) == key(site2))
    // min/max of one column track the same multiset
    assert(key(Min(col("v"), "lo")) == key(Max(col("v"), "hi")))
    // MIN_BY/MAX_BY over the same (value, arg) pair share too
    assert(key(MinBy(col("v"), col("h"), "a")) ==
      key(MaxBy(col("v"), col("h"), "b")))
  }

  test("literals that look like hashes or ExprIds do NOT collide") {
    // old textual canonicalization stripped @[0-9a-f]+ and #\d+ anywhere,
    // folding these four distinct tracked expressions into two keys
    assert(key(Min(concat(col("v"), lit("x@beef")), "a")) !=
      key(Min(concat(col("v"), lit("x@face")), "b")))
    assert(key(CountDistinct(concat(col("s"), lit("tag#1")), "c")) !=
      key(CountDistinct(concat(col("s"), lit("tag#2")), "d")))
    // and plainly different columns never collide
    assert(key(Min(col("v"), "a")) != key(Min(col("w"), "b")))
  }

  test("hash-lookalike literals keep separate aux state end-to-end") {
    // Two MIN specs whose tracked values differ only inside a literal a
    // textual key would strip: under the collision both would read one
    // shared multiset and at least one extremum would go stale after a
    // deletion. Maintain through an extremum-killing delete and compare
    // to recompute.
    val view = Aggregate(Scan("t"), Seq("g"), Seq(
      Min(concat(col("s"), lit("@beef")), "min_beef"),
      Min(concat(col("s"), lit("@face")), "min_face"),
      CountStar("n")))
    val t0 = Seq(Row("g1", "aa"), Row("g1", "bb"), Row("g2", "zz"))
    val base: String => DataFrame = { case "t" => df("g STRING, s STRING", t0) }
    def delta(rows: Seq[Row]): String => Option[DataFrame] = {
      case "t" => Some(df(s"g STRING, s STRING, ${IvmCore.MULT} BOOLEAN", rows))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("auxkey", view, base, store, deltaTables = null)
    val b1 = Seq(Row("g1", "aa", false), Row("g2", "mm", true)) // kill g1 min
    Ivm.refreshState("auxkey", view, base, delta(b1), store)
    assertSameRows(Ivm.read("auxkey", view, store),
      Ivm.recompute(view, base, delta(b1)))
    val got = Ivm.read("auxkey", view, store).where(col("g") === "g1")
      .select("min_beef", "min_face").collect().head
    assert(got.getString(0) == "bb@beef" && got.getString(1) == "bb@face")
  }
}
