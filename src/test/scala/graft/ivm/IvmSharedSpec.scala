package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Multi-view state sharing: views containing identical subtrees share one
  * content-addressed interior state; a batch refresh computes each shared
  * subtree's delta once and commits each shared state once. */
class IvmSharedSpec extends AnyFunSuite with SparkTestBase {

  private val inner = Aggregate(Scan("t"), Seq("g"),
    Seq(Count(col("v"), "c_count")))
  // two DIFFERENT outer views over the SAME interior aggregate
  private val v1 = Aggregate(inner, Seq("c_count"), Seq(CountStar("custdist")))
  private val v2 = Aggregate(inner, Seq.empty,
    Seq(Sum(col("c_count"), "total"), CountStar("n")))
  private val views = Map("v1" -> v1, "v2" -> v2)

  private def mkBase(rows: Seq[Row]): String => DataFrame = {
    val t = df("g STRING, v INT", rows)
    name => { require(name == "t"); t }
  }

  test("a stateful CTE instance spliced twice IN ONE VIEW keeps one state") {
    // the Q15 topology: `rev` read by the main query and its scalar gate —
    // canonical-instance naming must produce ONE rev state (plus the
    // scalar MAX state and its aux), refreshed once per batch
    val rev = Aggregate(Scan("t"), Seq("g"), Seq(Sum(col("v"), "sv")))
    val v = Project(
      Filter(
        Join(rev, Aggregate(rev, Seq.empty, Seq(Max(col("sv"), "__mx"))),
          Seq.empty),
        col("sv") === col("__mx")),
      Seq(col("g"), col("sv")))
    val root = Files.createTempDirectory("ivm-q15").toString
    val store = new ParquetStore(spark, root)
    val base = mkBase(Seq(Row("a", 1), Row("a", 2), Row("b", 10), Row("c", 9)))
    Ivm.create("q15", v, base, store)
    // state dirs under q15/: rev at its canonical path, the MAX top, the
    // MAX aux multiset, the top multiset — and NO second rev state
    def stateDirs = Files.list(Paths.get(s"$root/q15")).toArray
      .map(_.toString.split('/').last).sorted.toSeq
    val dirs = stateDirs
    // rev canonically at r.0.0.0; the scalar MAX at r.0.0.1 (+ its aux).
    // WITHOUT canonical naming a second rev state appears under the MAX's
    // child position r.0.0.1.0
    assert(dirs == Seq("r.0.0.0", "r.0.0.1", "r.0.0.1.aux.__mx", "top"),
      s"expected ONE rev state (no r.0.0.1.0 twin), got: $dirs")
    val d1 = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("b", 3, true), Row("c", 9, false))) // b takes the max; c dies
    val deltas: String => Option[DataFrame] =
      t => if (t == "t") Some(d1) else None
    Ivm.refreshState("q15", v, base, deltas, store)
    assertSameRows(Ivm.read("q15", v, store), Ivm.recompute(v, base, deltas))
    assert(stateDirs == dirs, "refresh created new state paths")
  }

  test("identical subtrees share one state directory; both views refresh correctly") {
    val root = Files.createTempDirectory("ivm-shared").toString
    val store = new ParquetStore(spark, root)
    val base = mkBase(Seq(Row("a", 1), Row("a", 2), Row("b", 10), Row(null, 5)))

    Ivm.createShared(views, base, store)

    // states: inner (shared once) + v1 top + v2 top = exactly 3
    val stateDirs = Files.list(Paths.get(s"$root/shared")).toArray.length
    assert(stateDirs == 3,
      s"expected 3 content-addressed states (inner shared), got $stateDirs")

    val d1 = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("a", 7, true), Row("b", 10, false), Row("c", 3, true))) // b dies
    val deltas1: String => Option[DataFrame] =
      t => if (t == "t") Some(d1) else None
    Ivm.refreshShared(views, base, deltas1, store)

    assertSameRows(Ivm.readShared(v1, store), Ivm.recompute(v1, base, deltas1))
    assertSameRows(Ivm.readShared(v2, store), Ivm.recompute(v2, base, deltas1))

    // second batch chains on the first (deletes a row inserted in batch 1)
    val d2 = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("c", 3, false), Row(null, 9, true)))
    Ivm.refreshShared(views, base, t => if (t == "t") Some(d2) else None, store)
    val all = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("a", 7, true), Row("b", 10, false), Row("c", 3, true),
        Row("c", 3, false), Row(null, 9, true)))
    val deltasAll: String => Option[DataFrame] =
      t => if (t == "t") Some(all) else None
    assertSameRows(Ivm.readShared(v1, store), Ivm.recompute(v1, base, deltasAll))
    assertSameRows(Ivm.readShared(v2, store), Ivm.recompute(v2, base, deltasAll))
  }

  test("a view that IS another view's subtree shares its top state") {
    val root = Files.createTempDirectory("ivm-shared2").toString
    val store = new ParquetStore(spark, root)
    val base = mkBase(Seq(Row("a", 1), Row("b", 2)))
    // inner itself registered as a view alongside v1 which contains it
    Ivm.createShared(Map("inner" -> inner, "v1" -> v1), base, store)
    val stateDirs = Files.list(Paths.get(s"$root/shared")).toArray.length
    assert(stateDirs == 2, s"inner's top must BE v1's interior state: $stateDirs")

    val d = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("b", 4, true)))
    val deltas: String => Option[DataFrame] = t => if (t == "t") Some(d) else None
    Ivm.refreshShared(Map("inner" -> inner, "v1" -> v1), base, deltas, store)
    assertSameRows(Ivm.readShared(inner, store), Ivm.recompute(inner, base, deltas))
    assertSameRows(Ivm.readShared(v1, store), Ivm.recompute(v1, base, deltas))
  }

  test("a batch touching only one view's table leaves sibling views untouched") {
    val store = new MemStore
    val t = df("g STRING, v INT", Seq(Row("a", 1), Row("b", 2)))
    val u = df("g STRING, h INT", Seq(Row("a", 10)))
    val base: String => DataFrame = { case "t" => t; case "u" => u }
    val vT = Aggregate(Scan("t"), Seq("g"), Seq(Sum(col("v"), "sum_v")))
    val vU = Aggregate(Scan("u"), Seq("g"), Seq(Sum(col("h"), "sum_h")))
    val both = Map("vt" -> vT, "vu" -> vU)
    Ivm.createShared(both, base, store)
    val d = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN", Seq(Row("a", 5, true)))
    val deltas: String => Option[DataFrame] =
      nm => if (nm == "t") Some(d) else None
    Ivm.refreshShared(both, base, deltas, store) // must not error on vU
    assertSameRows(Ivm.readShared(vT, store), Ivm.recompute(vT, base, deltas))
    assertSameRows(Ivm.readShared(vU, store), Eval.eval(vU, base))
  }

  test("shared views over a JOIN maintain across alternating-table batches") {
    val root = Files.createTempDirectory("ivm-shared-alt").toString
    val store = new ParquetStore(spark, root, buckets = 4, smallStateBytes = 0)
    val t = df("g STRING, v INT", Seq(Row("a", 1), Row("b", 2)))
    val u = df("g STRING, h INT", Seq(Row("a", 10)))
    val base: String => DataFrame = { case "t" => t; case "u" => u }
    val joined = Join(Scan("t"), Scan("u"), Seq("g"))
    val w1 = Aggregate(joined, Seq("g"), Seq(Sum(col("v") + col("h"), "s"),
      CountStar("n")))
    val w2 = Aggregate(joined, Seq.empty, Seq(CountStar("rows")))
    val both = Map("w1" -> w1, "w2" -> w2)
    Ivm.createShared(both, base, store)
    // batch 1: Δu; batch 2: Δt joins batch 1's u row through the SHARED
    // content-addressed accumulator (one acc per table across both views)
    val du = df(s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("b", 20, true)))
    Ivm.refreshShared(both, base, nm => if (nm == "u") Some(du) else None, store)
    val dt = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("b", 3, true), Row("a", 1, false)))
    Ivm.refreshShared(both, base, nm => if (nm == "t") Some(dt) else None, store)
    val deltasAll: String => Option[DataFrame] = {
      case "t" => Some(dt); case "u" => Some(du); case _ => None
    }
    assertSameRows(Ivm.readShared(w1, store), Ivm.recompute(w1, base, deltasAll))
    assertSameRows(Ivm.readShared(w2, store), Ivm.recompute(w2, base, deltasAll))
  }

  test("shared refresh equals private per-view refresh (MemStore)") {
    val shared = new MemStore
    val priv = new MemStore
    val base = mkBase(Seq(Row("a", 1), Row("a", 2), Row("b", 3)))
    Ivm.createShared(views, base, shared)
    Ivm.create("p1", v1, base, priv)
    Ivm.create("p2", v2, base, priv)
    val d = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("a", 1, false), Row("d", 8, true)))
    val deltas: String => Option[DataFrame] = t => if (t == "t") Some(d) else None
    Ivm.refreshShared(views, base, deltas, shared)
    Ivm.refreshState("p1", v1, base, deltas, priv)
    Ivm.refreshState("p2", v2, base, deltas, priv)
    assertSameRows(Ivm.readShared(v1, shared), Ivm.read("p1", v1, priv))
    assertSameRows(Ivm.readShared(v2, shared), Ivm.read("p2", v2, priv))
  }
}
