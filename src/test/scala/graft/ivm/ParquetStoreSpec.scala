package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The versioned parquet store — the at-scale state backend: refresh must
  * work identically to MemStore, old versions must stay readable during a
  * refresh (snapshot isolation), and pruning must bound disk usage. */
class ParquetStoreSpec extends AnyFunSuite with SparkTestBase {

  private def mkStore(keep: Int = 2) =
    (Files.createTempDirectory("ivm-pq").toString,
      (root: String) => new ParquetStore(spark, root, keepVersions = keep))

  test("create + two refreshes over ParquetStore equal recompute") {
    val (root, f) = mkStore()
    val store = f(root)
    val base: String => DataFrame = {
      case "t" => df("g STRING, v INT",
        Seq(Row("a", 1), Row("a", 2), Row("b", 10)))
    }
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(Sum(col("v"), "sum_v"), CountStar("cnt")))
    Ivm.create("pv", q, base, store)

    val d1 = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("a", 5, true), Row("b", 10, false))) // b dies
    Ivm.refresh("pv", q, base, t => if (t == "t") Some(d1) else None, store)

    val d2 = df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
      Seq(Row("c", 7, true), Row("a", 1, false)))
    Ivm.refresh("pv", q, base, t => if (t == "t") Some(d2) else None, store)

    val got = Ivm.read("pv", q, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 7L, 2L), ("c", 7L, 1L)))
  }

  test("snapshot isolation: a DataFrame resolved before put() keeps its version") {
    val (root, f) = mkStore(keep = 3)
    val store = f(root)
    store.put("s", df("x INT", Seq(Row(1))))
    val oldView = store("s") // resolves v1
    store.put("s", df("x INT", Seq(Row(2))))
    assert(oldView.collect().map(_.getInt(0)).toSeq == Seq(1))
    assert(store("s").collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("version pruning keeps only keepVersions directories") {
    val (root, f) = mkStore(keep = 2)
    val store = f(root)
    (1 to 5).foreach(i => store.put("s", df("x INT", Seq(Row(i)))))
    val dirs = new java.io.File(s"$root/s").listFiles()
      .filter(_.getName.startsWith("v")).map(_.getName).sorted.toSeq
    assert(dirs == Seq("v4", "v5"), s"got $dirs")
    assert(store("s").collect().map(_.getInt(0)).toSeq == Seq(5))
  }

  test("a fresh store instance recovers current versions from the _current pointer") {
    val (root, f) = mkStore()
    val s1 = f(root)
    s1.put("s", df("x INT", Seq(Row(42))))
    val s2 = f(root) // new instance, same root — reads pointer from disk
    assert(s2("s").collect().map(_.getInt(0)).toSeq == Seq(42))
  }
}
