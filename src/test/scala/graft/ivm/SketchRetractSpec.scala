package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch retraction fallback: a deletion reaching an APPROX_* state no
  * longer kills the view — the engine rebuilds ONLY the retraction-hit
  * groups' sketches from the post-batch child relation (O(touched groups'
  * rows), never a full rescan). Below the sketches' exact regimes (HLL
  * register union is order-free; KLL holds < k items uncompacted;
  * frequent-items is exact under maxMapSize distinct keys) the maintained
  * view must EQUAL recompute, so these tests assert row equality, not an
  * error window.
  */
class SketchRetractSpec extends AnyFunSuite with SparkTestBase {

  private val M = IvmCore.MULT

  private def mkT(rows: Seq[Row], withMult: Boolean): DataFrame =
    df(if (withMult) s"g STRING, v INT, $M BOOLEAN" else "g STRING, v INT", rows)

  private val sketchView: IvmQuery = Aggregate(Scan("t"), Seq("g"), Seq(
    ApproxCountDistinct(col("v"), 12, "ad"),
    ApproxPercentile(col("v"), 0.5, 200, "ap"),
    ApproxTopK(col("v"), 2, 64, "at"),
    CountStar("n")))

  private def check(q: IvmQuery, base0: Seq[Row], batches: Seq[Seq[Row]]): Unit = {
    val store = new MemStore
    val base: String => DataFrame = { case "t" => mkT(base0, withMult = false) }
    Ivm.create("sv", q, base, store)
    batches.foreach { b =>
      Ivm.refreshState("sv", q, base,
        nm => if (nm == "t") Some(mkT(b, withMult = true)) else None, store)
    }
    val got = Ivm.read("sv", q, store)
    val want = Ivm.recompute(q, base,
      nm => if (nm == "t") Some(mkT(batches.flatten, withMult = true)) else None)
    assertSameRows(got, want)
  }

  test("delete hitting HLL/KLL/freq states rebuilds touched groups only") {
    check(sketchView,
      base0 = Seq(Row("a", 1), Row("a", 2), Row("a", 2), Row("b", 5), Row("b", 6)),
      batches = Seq(
        // batch 1: delete one copy of (a,2) — group a rebuilds, b untouched
        Seq(Row("a", 2, false), Row("a", 7, true)),
        // batch 2: pure inserts — must union into the REBUILT sketch
        Seq(Row("a", 9, true), Row("b", 6, true)),
        // batch 3: delete the last copy of (a,2) and all of b's 5
        Seq(Row("a", 2, false), Row("b", 5, false))))
  }

  test("deleting every row of a group kills it; re-insert resurrects") {
    check(sketchView,
      base0 = Seq(Row("a", 1), Row("b", 5)),
      batches = Seq(
        Seq(Row("a", 1, false)),                  // group a dies
        Seq(Row("a", 3, true), Row("a", 3, true)) // reborn from scratch
      ))
  }

  test("global (no-key) sketch aggregate survives deletions") {
    val q = Aggregate(Scan("t"), Seq.empty, Seq(
      ApproxCountDistinct(col("v"), 12, "ad"),
      ApproxPercentile(col("v"), 0.5, 200, "ap"), CountStar("n")))
    check(q,
      base0 = Seq(Row("a", 1), Row("a", 2), Row("b", 3)),
      batches = Seq(
        Seq(Row("a", 2, false), Row("c", 8, true)),
        Seq(Row("b", 3, false))))
  }

  test("rebuild provably fires on sketch-hitting deletes, and provably " +
      "does NOT fire on inserts or null-only deletes") {
    val store = new MemStore
    val base: String => DataFrame = { case "t" =>
      mkT(Seq(Row("a", 1), Row("a", null), Row("b", 5)), withMult = false) }
    Ivm.create("prov", sketchView, base, store)
    def batch(rows: Row*): Unit = Ivm.refreshState("prov", sketchView, base,
      nm => if (nm == "t") Some(mkT(rows, withMult = true)) else None, store)
    val c0 = ZDelta.sketchRebuilds.get()
    batch(Row("a", 7, true), Row("b", 8, true)) // pure inserts
    assert(ZDelta.sketchRebuilds.get() == c0,
      "insert-only batch must not trigger a sketch rebuild")
    batch(Row("a", null, false)) // null-input delete: counts adjust only
    assert(ZDelta.sketchRebuilds.get() == c0,
      "null-only delete must not trigger a sketch rebuild")
    batch(Row("a", 1, false)) // a real sketch-input retraction
    assert(ZDelta.sketchRebuilds.get() == c0 + 1,
      "sketch-hitting delete must take the rebuild path")
    val want = Ivm.recompute(sketchView, base, nm =>
      if (nm == "t") Some(mkT(Seq(Row("a", 7, true), Row("b", 8, true),
        Row("a", null, false), Row("a", 1, false)), withMult = true))
      else None)
    assertSameRows(Ivm.read("prov", sketchView, store), want)
  }

  test("NULL sketch inputs retract without touching the sketch") {
    // deleting a NULL-v row adjusts counts but must NOT trigger a rebuild
    // (the guard only counts non-null sketch inputs) — and a mixed batch
    // (null delete + non-null delete) rebuilds correctly
    check(sketchView,
      base0 = Seq(Row("a", null), Row("a", 4), Row("b", null)),
      batches = Seq(
        Seq(Row("a", null, false)),               // null-only delete: no rebuild
        Seq(Row("a", 4, false), Row("a", null, true)))) // mixed
  }

  test("sketch over a join view folds weighted retractions (CDC-style)") {
    // join deltas multiply weights: deleting a u-side row retracts each
    // matching t row — the rebuild path must see the multiplied weights.
    // ApproxPercentile runs in its EXACT regime (< k distinct values), so
    // a weight-2 insert reaching the KLL with weight 1 would shift the
    // median and fail the recompute equality (the round-3 ADVICE bug).
    val q = Aggregate(
      Join(Project(Scan("t"), Seq(col("g"), col("v"))), Scan("u"), Seq("g")),
      Seq("h"), Seq(ApproxCountDistinct(col("v"), 12, "ad"),
        ApproxPercentile(col("v"), 0.5, 200, "ap"),
        ApproxTopK(col("v"), 1, 64, "at"), CountStar("n")))
    val store = new MemStore
    val t = mkT(Seq(Row("a", 1), Row("a", 2), Row("b", 5)), withMult = false)
    val u = df("g STRING, h INT",
      Seq(Row("a", 10), Row("a", 10), Row("b", 20), Row("d", 30)))
    val base: String => DataFrame = { case "t" => t; case "u" => u }
    Ivm.create("jv", q, base, store)
    // batch 1: u-side delete (retraction through the join) + a DOUBLE
    // insert of the same row — the accumulator consolidates it to ONE
    // count-2 row, so batch 2's join term carries w = 2 into the sketches
    val du = df(s"g STRING, h INT, $M BOOLEAN",
      Seq(Row("a", 10, false), Row("b", 20, true),
        Row("c", 30, true), Row("c", 30, true)))
    Ivm.refreshState("jv", q, base,
      nm => if (nm == "u") Some(du) else None, store)
    // batch 2: group h=30 mixes the w=2 path (g=c, v=4, 2 rows → count 4)
    // and the w=1 path (g=d, v=9, 3 rows → count 3). Weight-respecting
    // sketches put v=4 on top and median 4; weight-dropping ones would
    // see counts {4:2, 9:3} — top-1 flips to 9 and the median moves.
    val dt = df(s"g STRING, v INT, $M BOOLEAN",
      Seq(Row("c", 4, true), Row("c", 4, true),
        Row("d", 9, true), Row("d", 9, true), Row("d", 9, true)))
    Ivm.refreshState("jv", q, base,
      nm => if (nm == "t") Some(dt) else None, store)
    val got = Ivm.read("jv", q, store)
    val want = Ivm.recompute(q, base, nm => nm match {
      case "u" => Some(du); case "t" => Some(dt); case _ => None
    })
    assertSameRows(got, want)
  }

  test("Debezium update ops through Cdc.toDeltas drive an APPROX view") {
    // the exact composition round 3 flagged as broken: a CDC feed with `u`
    // ops (retraction ⊎ assertion) maintaining an APPROX_COUNT_DISTINCT
    val store = new MemStore
    val base: String => DataFrame =
      { case "t" => mkT(Seq(Row("a", 1), Row("a", 2), Row("b", 5)), withMult = false) }
    Ivm.create("cv", sketchView, base, store)
    val img = "STRUCT<g: STRING, v: INT>"
    val log = df(s"op STRING, before $img, after $img", Seq(
      Row("u", Row("a", 2), Row("a", 7)),   // update: v 2 -> 7
      Row("c", null, Row("b", 9)),          // insert
      Row("d", Row("b", 5), null)))         // delete
    val delta = graft.sources.Cdc.toDeltas(log)
    Ivm.refreshState("cv", sketchView, base,
      nm => if (nm == "t") Some(delta) else None, store)
    val got = Ivm.read("cv", sketchView, store)
    val want = Ivm.recompute(sketchView, base,
      nm => if (nm == "t") Some(delta) else None)
    assertSameRows(got, want)
  }
}
