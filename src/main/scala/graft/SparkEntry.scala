package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ivm._
import graft.ivm.AggSpec._
import graft.Fixtures._

/** Driver contract — one entry per implemented operator (SURVEY.md §2), each
  * with equivalent ANSI SQL the driver runs in DuckDB on the same parquet.
  *
  * Delta tables are derived deterministically from the base parquet
  * ([[Fixtures]]) so both engines construct identical inputs. Cross-engine
  * numeric parity rules (see .claude/skills/verify/SKILL.md):
  *   - money sums go through DECIMAL(18,2) then cast to DOUBLE once;
  *   - counts are BIGINT on both sides (DuckDB SUM(int)→HUGEINT is cast);
  *   - doubles are only ever passed through or summed when integer-valued.
  */
object SparkEntry {
  private val M = IvmCore.MULT
  private val W = IvmCore.WEIGHT

  /** Flagship: TPC-H Q13-style two-level aggregate over customer⋈orders,
    * evaluated through the engine's AST (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    q13(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- views

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Q13-ish: SELECT c_count, count(*) FROM (SELECT c_custkey, count(*)
    * FROM customer JOIN orders GROUP BY c_custkey) GROUP BY c_count. */
  private val q13View: IvmQuery =
    Aggregate(
      Aggregate(
        Join(
          Project(Scan("customer"), Seq(col("c_custkey").as("custkey"))),
          Project(Scan("orders"), Seq(col("o_custkey").as("custkey"))),
          Seq("custkey")),
        Seq("custkey"), Seq(CountStar("c_count"))),
      Seq("c_count"), Seq(CountStar("custdist")))

  private def q13(s: SparkSession, dir: String): DataFrame =
    Eval.eval(q13View, base(s, dir))

  /** The reference's flagship shape: Π(γ(σ(T))). */
  private val filterAggView: IvmQuery = Project(
    Aggregate(
      Filter(Scan("lineitem"), col("l_quantity") > 45),
      Seq("l_returnflag"),
      Seq(Sum(col("l_quantity"), "sum_qty"), Count(col("l_linestatus"), "cnt"))),
    Seq(col("l_returnflag"), col("sum_qty"), col("cnt")))

  private val aggView: IvmQuery =
    Aggregate(Scan("lineitem"), Seq("l_returnflag", "l_linestatus"),
      Seq(Sum(dec("l_extendedprice"), "sum_price"),
        Sum(col("l_quantity"), "sum_qty"), CountStar("cnt")))

  // -------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1: delta scan passthrough (SELECT * FROM view over delta rows).
    "q01_ivm_select_all" -> ((s, dir) =>
      ParityDelta.delta(Scan("lineitem"), t => deltas(s, dir)(t))),

    // O2/O4/O7: projection with computed column; multiplicity appended.
    "q02_ivm_project" -> ((s, dir) =>
      ParityDelta.delta(
        Project(Scan("lineitem"), Seq(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))),
        t => deltas(s, dir)(t))),

    // O3: filter over deltas, predicate unchanged.
    "q03_ivm_filter" -> ((s, dir) =>
      ParityDelta.delta(
        Project(
          Filter(Scan("lineitem"),
            col("l_quantity") > 45 && col("l_returnflag") === "R"),
          Seq(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),
        t => deltas(s, dir)(t))),

    // O5: group-by delta aggregate — one row per (group, ±), never merged.
    "q04_ivm_agg_groupby" -> ((s, dir) =>
      ParityDelta.delta(aggView, t => deltas(s, dir)(t))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_price").cast("double").as("sum_price"),
          col("sum_qty"), col("cnt"), col(M))),

    // O5 with SUM of an expression (reference tests/ivm_groupby.test:14).
    "q05_ivm_agg_expr" -> ((s, dir) =>
      ParityDelta.delta(
        Aggregate(Scan("lineitem"), Seq("l_returnflag"),
          Seq(Sum(col("l_quantity") + 2, "sum_qty2"),
            Count(col("l_shipdate"), "cnt_ship"))),
        t => deltas(s, dir)(t))),

    // O6: global aggregate groups by multiplicity alone.
    "q06_ivm_global_agg" -> ((s, dir) =>
      ParityDelta.delta(
        Aggregate(Scan("lineitem"), Seq.empty,
          Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt"))),
        t => deltas(s, dir)(t))),

    // The reference's flagship composed shape Π(γ(σ(T))).
    "q07_ivm_filter_agg" -> ((s, dir) =>
      ParityDelta.delta(filterAggView, t => deltas(s, dir)(t))),

    // Delta application (the half the reference leaves as future work):
    // materialize the view, fold the delta batch in, return the maintained
    // view. Must equal recomputation over base ⊎ delta.
    "q08_ivm_apply" -> ((s, dir) => {
      val store = new MemStore
      Ivm.create("q08", aggView, base(s, dir), store)
      Ivm.refresh("q08", aggView, base(s, dir), deltas(s, dir), store)
      Ivm.read("q08", aggView, store)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_price").cast("double").as("sum_price"),
          col("sum_qty"), col("cnt"))
    }),

    // Join delta: Δ(C⋈O) = ΔC⋈O ⊎ C⋈ΔO ⊎ ΔC⋈ΔO with weights multiplied
    // (poster math; reference code rejects joins).
    "q09_ivm_join_delta" -> ((s, dir) => {
      val deltaCustomer = tbl(s, dir, "customer")
        .where(col("c_custkey") % 29 === 0)
        .withColumn(M, col("c_custkey") % 2 === 0)
      val ds: String => Option[DataFrame] = {
        case "customer" => Some(deltaCustomer)
        case "orders"   => Some(deltaOrders(s, dir))
        case _          => None
      }
      val view = Join(
        Project(Scan("customer"),
          Seq(col("c_custkey").as("custkey"), col("c_mktsegment"))),
        Project(Scan("orders"),
          Seq(col("o_custkey").as("custkey"), col("o_totalprice"))),
        Seq("custkey"))
      ZDelta.delta(view, ZDelta.Ctx(base(s, dir), ds,
        p => sys.error(s"no aggregate state expected at $p")))
    }),

    // Flagship batch eval through the AST: Q13-style nested aggregation.
    "q10_q13" -> ((s, dir) => q13(s, dir)),
  )

  // ------------------------------------------------------------- oracles

  /** Deterministic derived deltas, as SQL fragments (Fixtures mirrors). */
  private val DL =
    s"SELECT *, (l_linenumber % 2 = 0) AS $M FROM lineitem WHERE l_orderkey % 97 = 0"
  private val DO_ =
    s"SELECT *, (o_orderkey % 2 = 0) AS $M FROM orders WHERE o_orderkey % 53 = 0"
  private val DC =
    s"SELECT *, (c_custkey % 2 = 0) AS $M FROM customer WHERE c_custkey % 29 = 0"

  def oracleSql: Map[String, String] = Map(
    "q01_ivm_select_all" -> DL,

    "q02_ivm_project" ->
      s"""SELECT l_orderkey, l_linenumber,
          l_extendedprice * (1 - l_discount) AS revenue, $M
          FROM ($DL)""",

    "q03_ivm_filter" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity, $M FROM ($DL)
          WHERE l_quantity > 45 AND l_returnflag = 'R'""",

    "q04_ivm_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
          SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS cnt, $M
          FROM ($DL) GROUP BY l_returnflag, l_linestatus, $M""",

    "q05_ivm_agg_expr" ->
      s"""SELECT l_returnflag, SUM(l_quantity + 2) AS sum_qty2,
          CAST(COUNT(l_shipdate) AS BIGINT) AS cnt_ship, $M
          FROM ($DL) GROUP BY l_returnflag, $M""",

    "q06_ivm_global_agg" ->
      s"""SELECT SUM(l_quantity) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS cnt,
          $M FROM ($DL) GROUP BY $M""",

    "q07_ivm_filter_agg" ->
      s"""SELECT l_returnflag, SUM(l_quantity) AS sum_qty,
          CAST(COUNT(l_linestatus) AS BIGINT) AS cnt, $M
          FROM ($DL) WHERE l_quantity > 45 GROUP BY l_returnflag, $M""",

    "q08_ivm_apply" ->
      s"""SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * w) AS DOUBLE) AS sum_price,
          SUM(l_quantity * w) AS sum_qty, CAST(SUM(w) AS BIGINT) AS cnt
          FROM (
            SELECT l_returnflag, l_linestatus, l_extendedprice, l_quantity,
                   1 AS w FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_linestatus, l_extendedprice, l_quantity,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
          ) GROUP BY l_returnflag, l_linestatus HAVING SUM(w) > 0""",

    "q09_ivm_join_delta" ->
      s"""WITH dc AS ($DC), do_ AS ($DO_)
          SELECT c.c_custkey AS custkey, c.c_mktsegment, o.o_totalprice,
                 CASE WHEN c.$M THEN 1 ELSE -1 END AS $W
          FROM dc AS c JOIN orders AS o ON c.c_custkey = o.o_custkey
          UNION ALL
          SELECT c.c_custkey AS custkey, c.c_mktsegment, o.o_totalprice,
                 CASE WHEN o.$M THEN 1 ELSE -1 END AS $W
          FROM customer AS c JOIN do_ AS o ON c.c_custkey = o.o_custkey
          UNION ALL
          SELECT c.c_custkey AS custkey, c.c_mktsegment, o.o_totalprice,
                 (CASE WHEN c.$M THEN 1 ELSE -1 END)
               * (CASE WHEN o.$M THEN 1 ELSE -1 END) AS $W
          FROM dc AS c JOIN do_ AS o ON c.c_custkey = o.o_custkey""",

    "q10_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
           SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS c_count
           FROM customer JOIN orders ON c_custkey = o_custkey
           GROUP BY c_custkey
         ) GROUP BY c_count""",
  )
}
