package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Materialized interior subviews ([[Materialize]]): a stateless compound
  * CTE spliced at several positions keeps ONE maintained multiset state;
  * parents read the state instead of re-running the CTE's base-scan join
  * per consumer per batch. Checks: the SQL frontend's auto-wrap
  * (structure + instance identity), multi-batch maintenance equivalence
  * vs recompute on both store backends (MemStore local path, ParquetStore
  * bucket-sliced path), deltas on both base tables, and group death. */
class MaterializeSpec extends AnyFunSuite with SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  // materializeCte is OFF by default (r08: an O(base) SPJ CTE state costs
  // more than it saves — see SqlFrontend.materializeShared); this suite
  // exercises the opt-in machinery, so flip it on for its duration
  // (suites run sequentially: Test/parallelExecution := false).
  override protected def beforeAll(): Unit = {
    super.beforeAll()
    sys.props("graft.materializeCte") = "true"
  }
  override protected def afterAll(): Unit = {
    sys.props.remove("graft.materializeCte")
    super.afterAll()
  }

  // mini TPC-H Q21 shape: shared join feeding two consumers + the top
  private def shape: (Materialize, IvmQuery) = {
    val j = Join(
      Project(Scan("t"), Seq(col("g"), col("v"))),
      Project(Scan("u"), Seq(col("g"), col("h"))), Seq("g"))
    val m = Materialize(j)
    val ns = Aggregate(m, Seq("g"), Seq(CountDistinct(col("v"), "nd")))
    val top = Aggregate(Join(m, ns, Seq("g")), Seq("g"),
      Seq(CountStar("n"), Sum(col("nd"), "snd")))
    (m, top)
  }

  private def tRows(n: Int) =
    (0 until n).map(i => Row(s"g${i % 4}", i % 7, i))
  private def uRows(n: Int) =
    (0 until n).map(i => Row(s"g${i % 5}", i * 2))

  private def runBatches(store: IvmStore): Unit = {
    val (_, q) = shape
    val t = df("g STRING, v INT, id INT", tRows(40))
    val u = df("g STRING, h INT", uRows(10))
    val base: String => DataFrame = {
      case "t" => t.select(col("g"), col("v"))
      case "u" => u
    }
    Ivm.create("mz", q, base, store)
    // batch 1: inserts + a delete on t; batch 2: u churn (kills/creates
    // whole join groups); batch 3: both sides in one batch
    val batches: Seq[Map[String, Seq[Row]]] = Seq(
      Map("t" -> Seq(Row("g0", 99, true), Row("g1", 1, false),
        Row("gNEW", 5, true))),
      Map("u" -> Seq(Row("g0", 0, false), Row("gNEW", 42, true))),
      Map("t" -> Seq(Row("gNEW", 5, false), Row("g2", 7, true)),
        "u" -> Seq(Row("g3", 6, false))))
    val applied = scala.collection.mutable.Map[String, Seq[Row]]()
      .withDefaultValue(Seq.empty)
    for (b <- batches) {
      for ((tb, rows) <- b) applied(tb) = applied(tb) ++ rows
      Ivm.refreshState("mz", q, base,
        nm => b.get(nm).map(rows => df(
          if (nm == "t") s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN"
          else s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN", rows)),
        store)
    }
    val want = Ivm.recompute(q, base,
      nm => applied.get(nm).filter(_.nonEmpty).map(rows => df(
        if (nm == "t") s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN"
        else s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN", rows)))
    assertSameRows(Ivm.read("mz", q, store), want)
  }

  test("multi-batch maintenance == recompute (MemStore)") {
    runBatches(new MemStore)
  }

  test("multi-batch maintenance == recompute (ParquetStore, sliced reads)") {
    val dir = java.nio.file.Files.createTempDirectory("mzspec").toString
    runBatches(new ParquetStore(spark, dir, buckets = 4))
  }

  test("SQL frontend wraps a shared stateless CTE in ONE Materialize instance") {
    val q = SqlFrontend.materializeShared(SqlFrontend.parseSelect(spark,
      """WITH j AS (
           SELECT g, v, h FROM (SELECT g, v FROM t)
           JOIN (SELECT g, h FROM u) USING (g)
         ), ns AS (SELECT g, COUNT(DISTINCT v) AS nd FROM j GROUP BY g)
         SELECT g, COUNT(*) AS n FROM j JOIN ns USING (g) GROUP BY g"""))
    val ms = new java.util.IdentityHashMap[Materialize, Unit]
    var occurrences = 0
    def walk(n: IvmQuery): Unit = n match {
      case m: Materialize =>
        occurrences += 1; ms.put(m, ()); walk(m.child)
      case Scan(_)             => ()
      case Filter(c, _)        => walk(c)
      case Project(c, _)       => walk(c)
      case Aggregate(c, _, _)  => walk(c)
      case Join(l, r, _)       => walk(l); walk(r)
      case LeftJoin(l, r, _)   => walk(l); walk(r)
      case RightJoin(l, r, _)  => walk(l); walk(r)
      case FullJoin(l, r, _)   => walk(l); walk(r)
      case Union(l, r)         => walk(l); walk(r)
      case TopK(c, _, _)       => walk(c)
      case WindowDeco(c, _)    => walk(c)
      case ExpandCount(c, _)   => walk(c)
      case ScalarDeco(c, s, _) => walk(c); s.foreach(walk)
    }
    walk(q)
    assert(occurrences == 2, s"expected the CTE spliced at 2 positions, got $occurrences")
    assert(ms.size == 1, "all positions must share ONE Materialize instance")
    assert(ms.keySet.iterator.next.child.isInstanceOf[Join])
    // a query with no shared compound CTE is returned untouched
    val plain = SqlFrontend.parseSelect(spark, "SELECT g, COUNT(*) AS n FROM t GROUP BY g")
    assert(SqlFrontend.materializeShared(plain) eq plain)
  }
}
