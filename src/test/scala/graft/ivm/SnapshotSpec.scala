package graft.ivm

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The refresh loop's soundness rests on [[IvmStore.readSnapshot]]: every
  * state read during delta construction resolves PRE-batch content even
  * while commits land concurrently. These tests pin that isolation for
  * both stores — a regression here reintroduces the post-batch-state race
  * the eager-commit refresh depends on never happening.
  */
class SnapshotSpec extends AnyFunSuite with SparkTestBase {

  private def values(d: org.apache.spark.sql.DataFrame): Seq[Int] =
    d.collect().map(_.getInt(0)).toSeq.sorted

  test("MemStore: snapshot reads survive later puts; writes rejected") {
    val store = new MemStore
    store.put("s", df("x INT", Seq(Row(1), Row(2))))
    val snap = store.readSnapshot()
    store.put("s", df("x INT", Seq(Row(9))))
    assert(values(snap("s")) == Seq(1, 2))
    assert(values(store("s")) == Seq(9))
    // a state created after the snapshot is invisible to it
    store.put("t", df("x INT", Seq(Row(5))))
    assert(snap.get("t").isEmpty)
    intercept[UnsupportedOperationException] {
      snap.put("u", df("x INT", Seq(Row(1))))
    }
  }

  test("ParquetStore: snapshot pins the manifest view incl. slices") {
    val root = java.nio.file.Files.createTempDirectory("snap-pq").toString
    val store = new ParquetStore(spark, root)
    store.putKeyed("s", df("k INT, v INT", Seq(Row(1, 10), Row(2, 20))), Seq("k"))
    val snap = store.readSnapshot()
    store.merge("s", df("k INT, v INT", Seq(Row(1, 99))),
      Seq("k"), org.apache.spark.sql.functions.lit(true))
    // live store sees the merge; the snapshot still serves the old rows
    assert(store("s").collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((1, 99), (2, 20)))
    assert(snap("s").collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((1, 10), (2, 20)))
    val keys = df("k INT", Seq(Row(1)))
    assert(snap.slice("s", keys, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 10)))
    intercept[UnsupportedOperationException] { snap.setTag("a", "b") }
  }

  test("ParquetStore: snapshot inside a transaction sees staged entries") {
    val root = java.nio.file.Files.createTempDirectory("snap-txn").toString
    val store = new ParquetStore(spark, root)
    store.put("s", df("x INT", Seq(Row(1))))
    store.transaction {
      store.put("s", df("x INT", Seq(Row(2)))) // staged, not yet flipped
      // a nested refresh (ScalarDeco subview ordering) must see the
      // earlier same-transaction commit through its snapshot
      val snap = store.readSnapshot()
      assert(values(snap("s")) == Seq(2))
    }
    assert(values(store("s")) == Seq(2))
  }
}
