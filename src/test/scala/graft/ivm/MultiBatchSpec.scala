package graft.ivm

import graft.SparkTestBase
import graft.ivm.AggSpec._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** State evolution over a SEQUENCE of delta batches — the steady-state IVM
  * loop: after k refreshes the maintained view must equal a recompute over
  * base ⊎ Δ₁ ⊎ … ⊎ Δₖ. Batch i's deletes are sampled from rows live after
  * batch i−1 (inserts from earlier batches can be deleted later), so state
  * transitions chain: groups/extrema/anti-rows born in one batch can die in
  * the next.
  */
class MultiBatchSpec extends AnyFunSuite with SparkTestBase {

  private val Batches = 3
  private val Seeds = 2

  private val keyGen = Gen.frequency(
    8 -> Gen.oneOf("a", "b", "c"),
    1 -> Gen.const(null.asInstanceOf[String]))
  private val genRow = for {
    g <- keyGen; h <- Gen.choose(0, 2)
    v <- Gen.oneOf(Gen.const(null), Gen.choose(-9, 9))
  } yield Row(g, h, v)
  private val genTable = Gen.resize(12, Gen.listOf(genRow))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def mkDf(rows: Seq[Row], withMult: Boolean): DataFrame =
    df(if (withMult) s"g STRING, h INT, v INT, ${IvmCore.MULT} BOOLEAN"
       else "g STRING, h INT, v INT", rows)

  /** One batch: inserts + deletes of currently-live rows; returns the batch
    * and the new live multiset. */
  private def nextBatch(live: List[Row], seed: Long): (List[Row], List[Row]) = {
    val ins = sample(Gen.resize(6, Gen.listOf(genRow)), seed)
    val dels = sample(
      if (live.isEmpty) Gen.const(List.empty[Row])
      else Gen.someOf(live).map(_.toList), seed * 31 + 7)
    val batch = ins.map(r => Row(r(0), r(1), r(2), true)) ++
      dels.map(r => Row(r(0), r(1), r(2), false))
    (batch, live.diff(dels) ++ ins)
  }

  private val shapes: Seq[(String, IvmQuery)] = Seq(
    "minmax_cd" -> Aggregate(Scan("t"), Seq("g"),
      Seq(Min(col("v"), "min_v"), Max(col("v"), "max_v"),
        CountDistinct(col("v"), "nd_v"), Sum(col("v"), "sum_v"), CountStar("n"))),
    "q13_loj" -> Aggregate(
      Aggregate(
        LeftJoin(Project(Scan("t"), Seq(col("g"), col("v"))),
          Project(Scan("u"), Seq(col("g"), col("h"))), Seq("g")),
        Seq("g", "v"), Seq(Count(col("h"), "c_count"))),
      Seq("c_count"), Seq(CountStar("custdist"))),
    "distinct" -> IvmQuery.distinct(Scan("t"), Seq("g", "h")),
    // FULL OUTER: anti-row births/deaths on both sides must chain correctly
    // across batches (a key born in batch 1 can die in batch 3)
    "foj" -> FullJoin(Project(Scan("t"), Seq(col("g"), col("v"))),
      Project(Scan("u"), Seq(col("g"), col("h"))), Seq("g")),
    // variance (second-moment state) + deterministic min_by/max_by (the
    // aux element is a STRUCT — exercises struct-typed state columns)
    "var_mby" -> Aggregate(Scan("t"), Seq("g"),
      Seq(VarSamp(col("v"), "vv"), StddevPop(col("v"), "sp"),
        MinBy(col("v"), col("h"), "am"), MaxBy(col("v"), col("h"), "ax"),
        CountStar("n"))))

  private def runBatches(name: String, q: IvmQuery, store: IvmStore,
      seed: Long, batches: Int): Unit = {
    val t0 = sample(genTable, seed * 7919L)
    val uRows = sample(genTable, seed * 104729L)
    val t = mkDf(t0, withMult = false)
    val u = mkDf(uRows, withMult = false).select(col("g"), col("h"))
    val base: String => DataFrame = { case "t" => t; case "u" => u }

    Ivm.create(name, q, base, store)

    var live = t0
    var allDeltas = List.empty[Row]
    for (b <- 1 to batches) {
      val (batch, newLive) = nextBatch(live, seed * 1000L + b)
      live = newLive
      allDeltas = allDeltas ++ batch
      Ivm.refreshState(name, q, base,
        nm => if (nm == "t") Some(mkDf(batch, withMult = true)) else None,
        store)
    }
    val got = Ivm.read(name, q, store)
    val want = Ivm.recompute(q, base,
      nm => if (nm == "t") Some(mkDf(allDeltas, withMult = true)) else None)
    withClue(s"$name seed=$seed after $batches batches: ") {
      assertSameRows(got, want)
    }
  }

  for ((name, q) <- shapes)
    test(s"$Batches sequential refreshes == recompute: $name") {
      for (seed <- 1 to Seeds)
        runBatches(name, q, new MemStore, seed, Batches)
    }

  // ---- deterministic traps of the DELTA-BOUND extremum maintenance
  // (rescan only on extremum death; least/greatest fold on inserts;
  // born/died arithmetic for the DISTINCT family):
  //   b1: partial delete of a DUPLICATED min (one copy survives — the
  //       value did not die, no rescan, min must not move)
  //   b2: kill the min outright → rescan falls back to the runner-up
  //   b3: empty group g entirely → its stored extremum must become NULL,
  //       not a stale fold against the dead value
  //   b4: re-insert into the emptied group → extrema restart from the
  //       batch alone (the stale-fold regression this ordering catches)
  test("extremum fold/rescan traps: dup-min delete, death, empty, re-insert") {
    val store = new MemStore
    val q = Aggregate(Scan("t"), Seq("g"),
      Seq(Min(col("v"), "min_v"), Max(col("v"), "max_v"),
        CountDistinct(col("v"), "nd_v"), SumDistinct(col("v"), "sd_v"),
        CountStar("n")))
    val t0 = List(Row("g", 0, 5), Row("g", 1, 5), Row("g", 2, 9),
      Row("h", 0, 1), Row("h", 1, 3))
    val base: String => DataFrame = { case "t" => mkDf(t0, withMult = false) }
    Ivm.create("trap", q, base, store)
    val batches = List(
      List(Row("g", 0, 5, false)),                     // b1: dup-min survives
      List(Row("g", 1, 5, false), Row("g", 3, 2, true)), // b2: min dies AND a lower insert arrives
      List(Row("g", 2, 9, false), Row("g", 3, 2, false)), // b3: g emptied
      List(Row("g", 4, 7, true), Row("h", 2, 1, true)))   // b4: rebirth; h dup value
    var applied = List.empty[Row]
    val expected = List(
      Set(("g", 5, 9, 2L, 14L, 2L), ("h", 1, 3, 2L, 4L, 2L)),
      Set(("g", 2, 9, 2L, 11L, 2L), ("h", 1, 3, 2L, 4L, 2L)),
      Set(("h", 1, 3, 2L, 4L, 2L)),
      Set(("g", 7, 7, 1L, 7L, 1L), ("h", 1, 3, 2L, 4L, 3L)))
    batches.zip(expected).zipWithIndex.foreach { case ((b, want), i) =>
      applied = applied ++ b
      Ivm.refreshState("trap", q, base,
        nm => if (nm == "t") Some(mkDf(b, withMult = true)) else None, store)
      val got = Ivm.read("trap", q, store).collect().map(r =>
        (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).toSet
      assert(got == want, s"after batch ${i + 1}: got $got")
    }
  }

  // ---- randomized ALTERNATING-table batches: odd batches delta t, even
  // batches delta u — every join shape must see the other table's earlier
  // batches (base ⊎ accumulator / state) when its own delta arrives.

  private val genRowU = for { g <- keyGen; h <- Gen.choose(0, 2) } yield Row(g, h)
  private def mkDfU(rows: Seq[Row], withMult: Boolean): DataFrame =
    df(if (withMult) s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN"
       else "g STRING, h INT", rows)
  private def nextBatchU(live: List[Row], seed: Long): (List[Row], List[Row]) = {
    val ins = sample(Gen.resize(6, Gen.listOf(genRowU)), seed)
    val dels = sample(
      if (live.isEmpty) Gen.const(List.empty[Row])
      else Gen.someOf(live).map(_.toList), seed * 31 + 7)
    val batch = ins.map(r => Row(r(0), r(1), true)) ++
      dels.map(r => Row(r(0), r(1), false))
    (batch, live.diff(dels) ++ ins)
  }

  private val altShapes: Seq[(String, IvmQuery)] = Seq(
    "alt_join_agg" -> Aggregate(
      Join(Project(Scan("t"), Seq(col("g"), col("v"))), Scan("u"), Seq("g")),
      Seq("g"), Seq(Sum(col("v"), "sv"), Sum(col("h"), "sh"), CountStar("n"))),
    "alt_join_spj" ->
      Join(Project(Scan("t"), Seq(col("g"), col("v"))), Scan("u"), Seq("g")),
    "alt_q13_loj" -> Aggregate(
      Aggregate(
        LeftJoin(Project(Scan("t"), Seq(col("g"), col("v"))),
          Project(Scan("u"), Seq(col("g"), col("h"))), Seq("g")),
        Seq("g", "v"), Seq(Count(col("h"), "c_count"))),
      Seq("c_count"), Seq(CountStar("custdist"))),
    "alt_foj" -> FullJoin(Project(Scan("t"), Seq(col("g"), col("v"))),
      Project(Scan("u"), Seq(col("g"), col("h"))), Seq("g")),
    // Aggregate-rooted join side: currentW must read the distinct set's
    // STATE, not replay it
    "alt_semi" -> IvmQuery.semiJoin(Scan("t"),
      Project(Scan("u"), Seq(col("g"))), Seq("g")))

  private def runBatchesAlt(name: String, q: IvmQuery, store: IvmStore,
      seed: Long, batches: Int): Unit = {
    val t0 = sample(genTable, seed * 7919L)
    val u0 = sample(Gen.resize(12, Gen.listOf(genRowU)), seed * 104729L)
    val t = mkDf(t0, withMult = false)
    val u = mkDfU(u0, withMult = false)
    val base: String => DataFrame = { case "t" => t; case "u" => u }
    Ivm.create(name, q, base, store)
    var liveT = t0; var liveU = u0
    var allT = List.empty[Row]; var allU = List.empty[Row]
    for (b <- 1 to batches) {
      val tTurn = b % 2 == 1
      val deltas: String => Option[DataFrame] =
        if (tTurn) {
          val (batch, nl) = nextBatch(liveT, seed * 1000L + b)
          liveT = nl; allT = allT ++ batch
          nm => if (nm == "t") Some(mkDf(batch, withMult = true)) else None
        } else {
          val (batch, nl) = nextBatchU(liveU, seed * 1000L + b)
          liveU = nl; allU = allU ++ batch
          nm => if (nm == "u") Some(mkDfU(batch, withMult = true)) else None
        }
      Ivm.refreshState(name, q, base, deltas, store)
    }
    val want = Ivm.recompute(q, base, {
      case "t" => Some(mkDf(allT, withMult = true))
      case "u" => Some(mkDfU(allU, withMult = true))
      case _   => None
    })
    withClue(s"$name seed=$seed after $batches batches: ") {
      assertSameRows(Ivm.read(name, q, store), want)
    }
  }

  for ((name, q) <- altShapes)
    test(s"4 ALTERNATING-table refreshes == recompute: $name") {
      for (seed <- 1 to Seeds)
        runBatchesAlt(name, q, new MemStore, seed, batches = 4)
    }

  test("4 alternating-table refreshes on a forced-LSM ParquetStore (join_agg + q13 + semi)") {
    for ((name, q) <- Seq(altShapes.head, altShapes(2), altShapes(4))) {
      val root = java.nio.file.Files.createTempDirectory("mb-alt-lsm").toString
      val store = new ParquetStore(spark, root, keepVersions = 2,
        buckets = 4, smallStateBytes = 0, maxChain = 2)
      runBatchesAlt(s"lsm_$name", q, store, seed = 5, batches = 4)
    }
  }

  // Soak: 12 alternating batches with maxChain=2 drives the accumulator
  // and match-count states through repeated overlay appends AND chain
  // compactions while both tables keep churning.
  test("12-batch alternating soak on the LSM store (join_agg)") {
    val root = java.nio.file.Files.createTempDirectory("mb-alt-soak").toString
    val store = new ParquetStore(spark, root, keepVersions = 2,
      buckets = 4, smallStateBytes = 0, maxChain = 2)
    runBatchesAlt("soak_join_agg", altShapes.head._2, store,
      seed = 11, batches = 12)
  }

  // Deltas on DIFFERENT tables in DIFFERENT batches: batch 2's Δt must
  // join against u AS OF batch 1 (base ⊎ Δu₁), not the original snapshot.
  // This is the cross-batch interaction the single-batch join formula
  // (ΔA⋈B ⊎ A⋈ΔB ⊎ ΔA⋈ΔB) misses unless sides are evaluated CURRENT.
  test("alternating-table deltas on a join view across batches") {
    val t = mkDf(List(Row("a", 0, 1), Row("b", 0, 2)), withMult = false)
      .select(col("g"), col("v"))
    val u = df("g STRING, h INT", Seq(Row("a", 10)))
    val base: String => DataFrame = { case "t" => t; case "u" => u }
    val shapes = Seq(
      // aggregate top
      "agg" -> Aggregate(Join(Scan("t"), Scan("u"), Seq("g")), Seq("g"),
        Seq(Sum(col("v") + col("h"), "s"), CountStar("n"))),
      // SPJ top (multiset state)
      "spj" -> Join(Scan("t"), Scan("u"), Seq("g")),
      // outer join: u-side key births must null-retract against CURRENT t
      "loj" -> FullJoin(Scan("t"), Scan("u"), Seq("g")))
    val batches: Seq[(String, Seq[Row])] = Seq(
      "u" -> Seq(Row("b", 20, true)),          // b gains u support
      "t" -> Seq(Row("b", 3, true)),           // joins Δu₁ from batch 1
      "u" -> Seq(Row("b", 20, false)),         // b loses that support again
      "t" -> Seq(Row("c", 7, true)),           // never matches
      "u" -> Seq(Row("c", 70, true), Row("a", 10, false)))
    def mkDelta(tbl: String, rows: Seq[Row]): DataFrame =
      if (tbl == "t")
        df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN", rows)
      else df(s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN", rows)
    for ((name, q) <- shapes) {
      val store = new MemStore
      Ivm.create(s"alt_$name", q, base, store)
      for ((tbl, rows) <- batches)
        Ivm.refreshState(s"alt_$name", q, base,
          nm => if (nm == tbl) Some(mkDelta(tbl, rows)) else None, store)
      val all = batches.groupBy(_._1).view.mapValues(bs =>
        mkDelta(bs.head._1, bs.flatMap(_._2))).toMap
      val want = Ivm.recompute(q, base, all.get)
      withClue(s"alt_$name: ") {
        assertSameRows(Ivm.read(s"alt_$name", q, store), want)
      }
    }
  }

  // The LSM engine path: forced-bucketed ParquetStore with maxChain=2, so
  // SIX sequential refreshes drive overlay appends AND repeated chain
  // compactions through the full engine (aux states, match counts, group
  // deaths) — not just the store-level unit tests.
  test("6 refreshes on a forced-LSM ParquetStore == recompute (minmax + q13 + var/min_by)") {
    for ((name, q) <- Seq(shapes.head, shapes(1), shapes(4))) {
      val root = java.nio.file.Files.createTempDirectory("mb-lsm").toString
      val store = new ParquetStore(spark, root, keepVersions = 2,
        buckets = 4, smallStateBytes = 0, maxChain = 2)
      runBatches(s"lsm_$name", q, store, seed = 3, batches = 6)
    }
  }
}
