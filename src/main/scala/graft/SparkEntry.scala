package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Flagship: the poster's running example — REAL TPC-H Q13 (left outer
    * join + two-level aggregation) evaluated through the engine's AST
    * (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    Eval.eval(q13RealView, base(spark, "/root/testdata/sf0.001"))

  // ---------------------------------------------------------------- views

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  /** Q13-ish (inner-join variant): SELECT c_count, count(*) FROM (SELECT
    * c_custkey, count(*) FROM customer JOIN orders GROUP BY c_custkey)
    * GROUP BY c_count. The REAL Q13 (left outer join) is [[q13RealView]]. */
  private val q13View: IvmQuery =
    Aggregate(
      Aggregate(
        Join(
          Project(Scan("customer"), Seq(col("c_custkey").as("custkey"))),
          Project(Scan("orders"), Seq(col("o_custkey").as("custkey"))),
          Seq("custkey")),
        Seq("custkey"), Seq(CountStar("c_count"))),
      Seq("c_count"), Seq(CountStar("custdist")))

  /** The poster's actual running example: customers with zero orders are
    * counted in the c_count = 0 bucket (LEFT OUTER join). */
  private[graft] val q13RealView: IvmQuery =
    Aggregate(
      Aggregate(
        LeftJoin(
          Project(Scan("customer"), Seq(col("c_custkey").as("custkey"))),
          Project(Scan("orders"), Seq(col("o_custkey").as("custkey"),
            col("o_orderkey"))),
          Seq("custkey")),
        Seq("custkey"), Seq(Count(col("o_orderkey"), "c_count"))),
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

  /** Maintained MinHash-LSH dedup, level 1 (q123): the per-document k=8
    * signature as ONE array-expression Project — shingling, md5 slicing
    * and the per-seed MIN all happen inside `transform`/`array_min`, no
    * explode — so the signature relation is a plain SPJ view the delta
    * rules maintain in O(‖Δdocuments‖): a batch re-hashes only its own
    * documents, never the corpus. Expressions mirror
    * [[ops.Dedup.minhashSignatures]] and the q22 DuckDB oracle exactly
    * (hex-slice minhash; min over distinct = min over all, so the
    * DISTINCT-shingle step is dropped for free). */
  /** 3-token shingle ARRAY over an already-split token array — the
    * oracle sh CTE (index range + 3-token re-split guard) without the
    * row explosion, so shingle-consuming views stay SPJ. Takes the token
    * ATTRIBUTE, not split(text): an expression inside a lambda re-executes
    * per element access (no CSE in interpreted higher-order functions), so
    * inlining split would re-split the document 3× per shingle. Callers
    * stage `split(text, " ")` into its own Project first. */
  private def shingleArrOf(toks: Column): Column = {
    def shingleAt(i: Column): Column = // get() is 0-based, null past the end
      concat_ws(" ", get(toks, i), get(toks, i + 1), get(toks, i + 2))
    org.apache.spark.sql.functions.filter(
      transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
        i => shingleAt(i)),
      sh => size(split(sh, " ")) === 3)
  }

  /** Level-1 signature view: the whole k=8 signature is ONE native
    * expression ([[functions.MinhashSig]], single imperative pass) —
    * the staged higher-order-function form it replaces (split once →
    * shingle array → 2 md5 transforms → 8 array_min passes) was already
    * 20× the naive single-project form but still all interpreted;
    * `MinhashSigSpec` pins native ≡ staged on real documents. The
    * under-3-tokens filter sits on the cheap token count (provably
    * equivalent to a signature-null check: tokens cannot contain the
    * separator, so every 3-token window re-splits to exactly 3) and
    * pushes to the scan. Takes the session: the native function must be
    * registered before analysis. */
  private[graft] def dedupSigView(s: SparkSession): IvmQuery =
    Project(
      Project(
        Filter(Scan("documents"), size(split(col("text"), " ")) >= 3),
        Seq(col("doc_id").cast("long").as("did"),
          graft.functions.MinhashSig.of(s, col("text")).as("mhs"))),
      col("did") +: (0 until 8).map(i =>
        element_at(col("mhs"), i + 1).as(s"mh$i")))

  /** Maintained dedup, level 2 (q123): candidate near-duplicate pairs as
    * four band self-joins over the SIGNATURE VIEW (cascade level 1) with
    * a DISTINCT top (group liveness retracts a pair when either doc
    * dies). Banding via a Union of per-band joins instead of posexplode
    * keeps every node inside the delta algebra; each join shuffles on its
    * band key exactly like the exploded form would. */
  private[graft] lazy val dedupPairsView: IvmQuery = {
    // Four per-band self-joins unioned, not one join over a 4×-banded
    // union: measured head-to-head at sf0.1 the banded-union form is
    // SLOWER (1.63 s vs 1.44 s steady refresh) — trace replay already
    // amortizes the extra terms' per-batch floor, while the union
    // quadruples the rows every join side materializes per batch.
    //
    // Band key = the TWO RAW minhash columns, not md5(concat_ws(...)):
    // band equality ⇔ component equality, so the pair set is identical,
    // and the md5+concat per current-side row per band term (~40k hash
    // evaluations per refresh at sf0.1, the largest slice of the pairs
    // level's touched-pin compute — r08 profile) is replaced by plain
    // column renames; the equi-join hashes two longs instead of a 32-char
    // string. (md5 bought nothing distributionally either: same key →
    // same bucket with or without it.)
    //
    // The "identical pair set" claim DEPENDS on mh0..mh7 being non-null
    // by construction (the >=3-token filter in dedupSigView guarantees a
    // full signature): md5(concat_ws(...)) skips NULL components, so a
    // row with a NULL minhash could still pair under the old key, while
    // raw-column equi-joins never match on NULL. If dedupSigView ever
    // admits NULL signature components, the two keyings diverge.
    def bandPairs(b: Int): IvmQuery = Project(
      Filter(
        Join(
          Project(Scan("sig123"), Seq(col("did").as("a_id"),
            col(s"mh${2 * b}").as("bk1"), col(s"mh${2 * b + 1}").as("bk2"))),
          Project(Scan("sig123"), Seq(col("did").as("b_id"),
            col(s"mh${2 * b}").as("bk1"), col(s"mh${2 * b + 1}").as("bk2"))),
          Seq("bk1", "bk2")),
        col("a_id") < col("b_id")),
      Seq(col("a_id"), col("b_id")))
    IvmQuery.distinct(
      (1 until 4).map(bandPairs).foldLeft(bandPairs(0): IvmQuery)(Union(_, _)),
      Seq("a_id", "b_id"))
  }

  /** Maintained embedding near-dup (q124): cosine pairs within a blocking
    * key as a DISTINCT-topped view under embedding inserts AND deletes —
    * a batch joins only its own vectors' blocks against the maintained
    * side. The dot product is the CODEGEN'd [[functions.VecDot]]
    * expression (the interpreted `zip_with`/`aggregate` fold measured
    * ~15× slower over the sf0.1 pair count), and each side's norm is
    * computed ONCE below the join instead of per pair — the same two
    * choices the batch [[ops.Dedup.embeddingNearDup]] makes, and the
    * same fold order, so the q24-proven DuckDB mirror applies verbatim.
    * The threshold filter runs on the UNROUNDED cosine; the stored key
    * is rounded to 6 dp for cross-engine stability. Takes the session:
    * the codegen function must be registered before analysis. */
  private def embNearDupView(s: SparkSession): IvmQuery = {
    def dot(a: Column, b: Column) = graft.functions.VecDot.dot(s, a, b)
    def side(idName: String, vName: String, nName: String): IvmQuery =
      Project(Scan("embeddings"), Seq(col("label").as("blk"),
        col("vec_id").cast("long").as(idName), col("embedding").as(vName),
        sqrt(dot(col("embedding"), col("embedding"))).as(nName)))
    IvmQuery.distinct(
      Project(
        Filter(
          Project(
            Filter(Join(side("a_id", "va", "na"), side("b_id", "vb", "nb"),
              Seq("blk")), col("a_id") < col("b_id")),
            Seq(col("a_id"), col("b_id"),
              (dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("cosine"))),
          col("cosine") >= 0.35),
        Seq(col("a_id"), col("b_id"), round(col("cosine"), 6).as("cosine"))),
      Seq("a_id", "b_id", "cosine"))
  }

  /** Maintained decontamination (q125): corpus docs sharing ≥ 3 distinct
    * word 3-grams with an eval-set doc, as a maintained view under
    * document churn ON BOTH SIDES (eval-set docs live in the same table
    * here, so one batch can move corpus and benchmark at once — the q88
    * same-table-both-sides delta rules apply). The n-gram overlap is
    * `size(array_intersect(...))` over per-doc shingle arrays; the
    * eval side is tiny by construction, so the constant-key join
    * broadcasts it — per batch the corpus side contributes only its
    * delta. The batch q72 pipeline is the per-release equivalent. */
  private lazy val decontamView: IvmQuery = {
    // same staging rationale as [[dedupSigView]]: split once, shingle once
    def side(pred: Column, idName: String, shName: String): IvmQuery =
      Project(
        Project(Filter(Scan("documents"), pred),
          Seq(col("doc_id").cast("long").as(idName),
            split(col("text"), " ").as("toks"))),
        Seq(col(idName),
          array_distinct(shingleArrOf(col("toks"))).as(shName),
          lit(1).as("one")))
    val bench = side(col("doc_id") < 20, "b_id", "b_sh")
    val corpus = side(col("doc_id") >= 20, "c_id", "c_sh")
    IvmQuery.distinct(
      Project(
        Filter(
          Project(Join(corpus, bench, Seq("one")),
            Seq(col("c_id"), col("b_id"),
              size(array_intersect(col("c_sh"), col("b_sh"))).as("hits"))),
          col("hits") >= 3),
        Seq(col("c_id"), col("b_id"), col("hits"))),
      Seq("c_id", "b_id", "hits"))
  }

  /** Maintained curation pipeline (q126): q63's per-release job —
    * hash-sample → quality/lang scoring → threshold → exact dedup
    * (keep-min-id per content digest) → per-language corpus stats — as a
    * TWO-LEVEL maintained cascade. Level 1 groups the sampled+scored
    * docs by content digest and carries the kept doc's lang/tokens/
    * quality through MIN_BY (doc_id is unique, so arg_min ties cannot
    * differ cross-engine); level 2 aggregates per-language stats from
    * level 1's changelog. Quality is rounded to 9 dp and summed as
    * DECIMAL so the incrementally maintained average is EXACT (a
    * floating sum would drift from the oracle's one-shot sum under
    * delete-then-insert churn). */
  private lazy val curationKeptView: IvmQuery = {
    val t = col("text")
    Aggregate(
      Project(
        Filter(
          Project(Scan("documents"), Seq(col("doc_id"), t,
            ops.TextOps.qualityScore(t).as("quality"),
            ops.TextOps.langId(t).as("pred_lang"),
            ops.TextOps.nTokens(t).as("n_tokens"))),
          ops.TextOps.hashSplit(col("doc_id"), 100) < 80 &&
            col("quality") > 0.5),
        Seq(md5(col("text")).as("h"), col("doc_id"), col("pred_lang"),
          col("n_tokens"),
          round(col("quality"), 9).cast("decimal(18,9)").as("quality"))),
      Seq("h"),
      Seq(Min(col("doc_id"), "keep_id"),
        MinBy(col("doc_id"), col("pred_lang"), "keep_lang"),
        MinBy(col("doc_id"), col("n_tokens"), "keep_tokens"),
        MinBy(col("doc_id"), col("quality"), "keep_quality"),
        CountStar("n_copies")))
  }

  private lazy val curationStatsView: IvmQuery =
    Project(
      Aggregate(Scan("kept126"), Seq("keep_lang"),
        Seq(CountStar("n_docs"),
          Sum(col("keep_tokens").cast("long"), "n_tokens"),
          Sum(col("keep_quality"), "sum_q"))),
      Seq(col("keep_lang").as("pred_lang"), col("n_docs"), col("n_tokens"),
        round(col("sum_q").cast("double") / col("n_docs"), 6)
          .as("avg_quality")))

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
      Ivm.refreshState("q08", aggView, base(s, dir), deltas(s, dir), store)
      Ivm.read("q08", aggView, store)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_price").cast("double").as("sum_price"),
          col("sum_qty"), col("cnt"))
    }),

    // MIN/MAX maintained under deletion via auxiliary value-multiset state
    // (the reference poster's named future work): materialize, fold the
    // delta in (deletes can remove the current extremum), read back.
    "q11_ivm_minmax_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
        Seq(Min(col("l_quantity"), "min_qty"), Max(col("l_quantity"), "max_qty"),
          Min(col("l_shipdate"), "min_ship"), CountStar("cnt")))
      Ivm.create("q11", v, base(s, dir), store)
      Ivm.refreshState("q11", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q11", v, store)
    }),

    // DISTINCT as a maintainable view (dropDuplicates IVM-style): group
    // liveness under inserts AND deletes is the distinct row set.
    "q12_ivm_distinct_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = IvmQuery.distinct(
        Project(Scan("lineitem"),
          Seq(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))),
        Seq("l_returnflag", "l_linestatus", "l_quantity"))
      Ivm.create("q12", v, base(s, dir), store)
      Ivm.refreshState("q12", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q12", v, store)
    }),

    // AVG maintained as (sum, non-null count); quantity is integer-valued
    // double so the maintained sum stays exact and the final division is
    // bit-identical across engines.
    "q16_ivm_avg_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag", "l_linestatus"),
        Seq(Avg(col("l_quantity"), "avg_qty"), CountStar("cnt")))
      Ivm.create("q16", v, base(s, dir), store)
      Ivm.refreshState("q16", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q16", v, store)
    }),

    // COUNT(DISTINCT) maintained under deletion (distinct aggregation via
    // the same value-multiset state as MIN/MAX).
    "q15_ivm_count_distinct_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
        Seq(CountDistinct(col("l_quantity"), "nd_qty"),
          CountDistinct(col("l_suppkey"), "nd_supp"), CountStar("cnt")))
      Ivm.create("q15", v, base(s, dir), store)
      Ivm.refreshState("q15", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q15", v, store)
    }),

    // REAL TPC-H Q13 (LEFT OUTER join + two-level aggregation — the
    // poster's running example), maintained incrementally: customers with
    // zero orders keep c_count = 0 through order deletions/insertions via
    // the match-count state's 0↔>0 transitions.
    "q14_ivm_q13_real_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = q13RealView
      Ivm.create("q14", v, base(s, dir), store)
      Ivm.refreshState("q14", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q14", v, store)
    }),

    // The full SQL front-end path under the oracle gate: CREATE IMMV with
    // a GROUP BY EXPRESSION (folds to a Project inserted below the
    // Aggregate) parsed by Spark's parser, then materialized + refreshed.
    "q38_immv_groupby_expr" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q38 AS
           SELECT CAST(year(l_shipdate) AS BIGINT) AS syear,
                  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
                  COUNT(*) AS cnt
           FROM lineitem GROUP BY syear""")
      Ivm.create("q38", v, base(s, dir), store)
      Ivm.refreshState("q38", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q38", v, store)
        .select(col("syear"), col("sum_qty").cast("double").as("sum_qty"),
          col("cnt"))
    }),

    // Poster Q13 written as nested sub-selects in PURE SQL: parser →
    // frontend fold (sub-select, LEFT OUTER JOIN USING, two aggregation
    // levels) → maintained view, refreshed against the orders delta.
    "q39_immv_nested_sql" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q39 AS
           SELECT c_count, COUNT(*) AS custdist FROM (
             SELECT custkey, COUNT(o_orderkey) AS c_count FROM
               (SELECT c_custkey AS custkey FROM customer) c
               LEFT OUTER JOIN
               (SELECT o_custkey AS custkey, o_orderkey FROM orders) o
               USING (custkey)
             GROUP BY custkey
           ) GROUP BY c_count""")
      Ivm.create("q39", v, base(s, dir), store)
      Ivm.refreshState("q39", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q39", v, store)
    }),

    // SUM(DISTINCT) maintained under deletion via the same value-multiset
    // aux state as COUNT(DISTINCT)/MIN/MAX: the sum over alive values.
    "q46_ivm_sum_distinct_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q46 AS
           SELECT l_returnflag, SUM(DISTINCT l_quantity) AS sdq,
                  COUNT(DISTINCT l_quantity) AS cdq, COUNT(*) AS n
           FROM lineitem GROUP BY l_returnflag""")
      Ivm.create("q46", v, base(s, dir), store)
      Ivm.refreshState("q46", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q46", v, store)
    }),

    // Maintained UNION ALL view (Δ(A⊎B) = ΔA⊎ΔB, stateless) with deltas
    // arriving on BOTH inputs in the same batch, aggregated on top.
    "q43_ivm_union_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q43 AS
           SELECT src, SUM(amt) AS total, COUNT(*) AS n FROM (
             SELECT 'L' AS src, CAST(l_extendedprice AS DECIMAL(18,2)) AS amt
             FROM lineitem
             UNION ALL
             SELECT 'O' AS src, CAST(o_totalprice AS DECIMAL(18,2)) AS amt
             FROM orders
           ) GROUP BY src""")
      Ivm.create("q43", v, base(s, dir), store)
      Ivm.refreshState("q43", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q43", v, store)
        .select(col("src"), col("total").cast("double").as("total"), col("n"))
    }),

    // Maintained INTERSECT: (returnflag, linestatus) combos present among
    // BOTH high-quantity and low-quantity lineitems; the same delta batch
    // feeds both sides, and a combo leaves when either side's support dies.
    "q44_ivm_intersect_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q44 AS
           SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity > 48
           INTERSECT
           SELECT l_returnflag, l_linestatus FROM lineitem WHERE l_quantity < 3""")
      Ivm.create("q44", v, base(s, dir), store)
      Ivm.refreshState("q44", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q44", v, store)
    }),

    // Maintained EXCEPT: (part-bucket, linenumber) combos present among
    // mid-quantity rows but absent at the qty=50 extreme — a ~6k-row
    // survivor set whose membership the delta batch can flip.
    "q45_ivm_except_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q45 AS
           SELECT l_partkey % 997 AS pb, l_linenumber FROM lineitem
           WHERE l_quantity > 25
           EXCEPT
           SELECT l_partkey % 997 AS pb, l_linenumber FROM lineitem
           WHERE l_quantity > 49""")
      Ivm.create("q45", v, base(s, dir), store)
      Ivm.refreshState("q45", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q45", v, store)
    }),

    // Maintained SEMI JOIN via SQL IN-subquery: orders whose odd-numbered
    // lineitems survive. The delta deletes exactly the odd lines of
    // touched orders, so matched keys DIE from the distinct set and their
    // order rows retract — the 1→0 membership transition under the gate.
    "q40_ivm_semi_join" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q40 AS
           SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
           FROM orders
           WHERE o_orderkey IN
             (SELECT l_orderkey FROM lineitem WHERE l_linenumber % 2 = 1)""")
      val ds: String => Option[DataFrame] =
        t => if (t == "lineitem") deltas(s, dir)(t) else None
      Ivm.create("q40", v, base(s, dir), store)
      Ivm.refreshState("q40", v, base(s, dir), ds, store)
      Ivm.read("q40", v, store)
    }),

    // Maintained ANTI JOIN (NOT EXISTS): customers with no URGENT order.
    // Deleting a customer's LAST urgent order moves them INTO the view —
    // the composition rides the LeftJoin 0↔>0 match-count machinery.
    "q41_ivm_anti_join" -> ((s, dir) => {
      val store = new MemStore
      val v = IvmQuery.antiJoin(
        Project(Scan("customer"), Seq(col("c_custkey"),
          col("c_acctbal").cast("double").as("acctbal"))),
        Project(Filter(Scan("orders"), col("o_orderpriority") === "1-URGENT"),
          Seq(col("o_custkey").as("c_custkey"))),
        Seq("c_custkey"),
        leftCols = Seq(col("c_custkey"), col("acctbal")))
      val ds: String => Option[DataFrame] =
        t => if (t == "orders") deltas(s, dir)(t) else None
      Ivm.create("q41", v, base(s, dir), store)
      Ivm.refreshState("q41", v, base(s, dir), ds, store)
      Ivm.read("q41", v, store)
    }),

    // HAVING over a maintained aggregate (unsupported in BOTH reference
    // engines, README.md:34): the delta batch moves groups across the
    // parity predicate, so membership enters/leaves incrementally.
    "q19_ivm_having_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Filter(
        Aggregate(Scan("lineitem"), Seq("l_returnflag", "l_linestatus"),
          Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt"))),
        col("cnt") % 2 === 0)
      Ivm.create("q19", v, base(s, dir), store)
      Ivm.refreshState("q19", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q19", v, store)
    }),

    // RIGHT OUTER join maintained incrementally: the preserved side is
    // customer; order deletions drive 0<->n match-count transitions that
    // (un)null-extend customer rows, observable through COUNT(o_totalprice)
    // vs COUNT(*) per market segment.
    "q17_ivm_right_join_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(
        RightJoin(
          Project(Scan("orders"),
            Seq(col("o_custkey").as("custkey"), col("o_totalprice"))),
          Project(Scan("customer"),
            Seq(col("c_custkey").as("custkey"), col("c_mktsegment"))),
          Seq("custkey")),
        Seq("c_mktsegment"),
        Seq(Count(col("o_totalprice"), "cnt_orders"), CountStar("n")))
      Ivm.create("q17", v, base(s, dir), store)
      Ivm.refreshState("q17", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q17", v, store)
    }),

    // FULL OUTER join with deltas on BOTH sides: customer deletions orphan
    // their orders (left-null rows born), order deletions orphan customers
    // (right-null rows born); both match-count states exercise 0<->n.
    "q18_ivm_full_join_apply" -> ((s, dir) => {
      val store = new MemStore
      val deltaCustomer = tbl(s, dir, "customer")
        .where(col("c_custkey") % 29 === 0)
        .withColumn(M, col("c_custkey") % 2 === 0)
      val ds: String => Option[DataFrame] = {
        case "customer" => Some(deltaCustomer)
        case "orders"   => Some(deltaOrders(s, dir))
        case _          => None
      }
      val v = Aggregate(
        FullJoin(
          Project(Scan("customer"),
            Seq(col("c_custkey").as("ck"), col("c_acctbal"))),
          Project(Scan("orders"),
            Seq(col("o_custkey").as("ck"), col("o_totalprice"))),
          Seq("ck")),
        Seq.empty,
        Seq(Count(col("c_acctbal"), "n_c"), Count(col("o_totalprice"), "n_o"),
          CountStar("n")))
      Ivm.create("q18", v, base(s, dir), store)
      Ivm.refreshState("q18", v, base(s, dir), ds, store)
      Ivm.read("q18", v, store)
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

    // ------------------- training-data pipeline operators (graft.ops) ----

    // Exact dedup: hash-groupBy on content digest.
    "q20_dedup_exact" -> ((s, dir) =>
      ops.Dedup.exact(tbl(s, dir, "documents"))),

    // n-gram Jaccard near-dup pairs via inverted shingle index.
    "q21_dedup_jaccard" -> ((s, dir) =>
      ops.Dedup.ngramJaccardPairs(tbl(s, dir, "documents"),
        n = 3, threshold = 0.5, maxShingleDf = 100)),

    // Context-window chunking: 64-token chunks with 16-token overlap, one
    // row per (doc, chunk) — zero shuffle, slice-before-explode.
    "q80_chunk" -> ((s, dir) =>
      ops.TextOps.chunk(tbl(s, dir, "documents"),
        chunkTokens = 64, overlap = 16)),

    // PII redaction (anonymization pass): the corpus is word-salad, so
    // both engines append IDENTICAL derived PII (email/phone/SSN shapes
    // from doc_id arithmetic) and must then count + redact it identically
    // — a true cross-dialect regex parity check (Java regex vs RE2).
    "q75_redact" -> ((s, dir) => {
      val withPii = tbl(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@mail.example or 555-"),
          (col("doc_id") % 900 + 100).cast("string"), lit("-1234 ssn 123-45-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
      ops.TextOps.redact(withPii)
        .select("doc_id", "n_emails", "n_phones", "n_ids", "redacted")
    }),

    // Benchmark decontamination: corpus docs sharing >= 2 distinct 3-gram
    // shingles with an eval-set doc (eval set = doc_id % 101 = 0). The
    // bench shingle set broadcasts; the corpus never self-joins.
    "q72_decontaminate" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ops.Dedup.benchmarkOverlap(
        docs.where(col("doc_id") % 101 =!= 0),
        docs.where(col("doc_id") % 101 === 0),
        n = 3, minHits = 2)
    }),

    // MinHash + LSH banding candidate pairs.
    "q22_dedup_minhash" -> ((s, dir) =>
      ops.Dedup.minhashLshPairs(tbl(s, dir, "documents"), k = 8, bands = 4)),

    // SimHash 32-bit fingerprints per document.
    "q23_dedup_simhash" -> ((s, dir) =>
      ops.Dedup.simhashDocs(tbl(s, dir, "documents"))),

    // Duplicate CLUSTERS from the MinHash pairs: connected components via
    // min-label propagation (diameter-bounded shuffle rounds), then one
    // row per cluster — the keep-one-per-cluster decision a dedup pipeline
    // actually executes. Oracle: DuckDB recursive-CTE transitive closure.
    "q64_dedup_clusters" -> ((s, dir) => {
      val pairs = ops.Dedup.minhashLshPairs(tbl(s, dir, "documents"), k = 8, bands = 4)
      ops.Dedup.clusters(pairs)
        .groupBy("rep")
        .agg(count(lit(1)).as("size"), max("id").as("max_id"))
    }),

    // Embedding cosine near-dup pairs, label-blocked.
    "q24_dedup_embedding" -> ((s, dir) =>
      ops.Dedup.embeddingNearDup(tbl(s, dir, "embeddings"), threshold = 0.35)
        .withColumn("cosine", round(col("cosine"), 6))),

    // Brute-force cosine top-k (ANN baseline).
    "q25_ann_topk" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      ops.Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 8), k = 5)
    }),

    // Sign-bucket LSH ANN (the scale path).
    "q26_ann_bucketed" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      ops.Similarity.bucketedTopK(emb, emb.where(col("vec_id") < 8), k = 5)
    }),

    // Product-quantization ANN (the MEMORY scale path: 8-byte packed
    // codes + ADC look-up scoring + exact re-rank of the shortlist).
    // With rerank covering the corpus the shortlist is everything and the
    // exact tail IS brute force — the DuckDB oracle; the compression/
    // recall trade-off at working rerank sizes is measured in PqSpec and
    // the bench ann block.
    "q74_ann_pq" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      // small codebook: the full-corpus re-rank result is centroid-
      // independent (the oracle equality is exact for ANY codebook);
      // recall at working sizes uses 8x64 in PqSpec/bench
      val model = ops.Pq.train(emb, m = 8, k = 16, iters = 2)
      ops.Pq.topKRerank(ops.Pq.encode(emb, model), emb,
        emb.where(col("vec_id") < 8), k = 5, model, rerank = 100)
    }),

    // IVF-ANN with LEARNED centroids (k-means-lite), exhaustive probing:
    // scanning all cells is exactly brute force, which is the DuckDB
    // oracle; the recall/probe-budget trade-off is measured in IvfSpec.
    "q52_ann_ivf" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val model = ops.Ivf.train(emb, k = 16, iters = 3)
      ops.Ivf.topK(emb, emb.where(col("vec_id") < 8), k = 5, model,
        nprobe = model.nCells)
    }),

    // The on-disk IVF index: corpus written partitionBy(ivf_cell), query
    // reads ONLY probed cell directories. Exhaustive probe ≡ brute force,
    // so the same analytic oracle gates the whole write→prune→read path.
    "q53_ann_ivf_disk" -> ((s, dir) => {
      val emb = tbl(s, dir, "embeddings")
      val model = ops.Ivf.train(emb, k = 16, iters = 3)
      val idx = java.nio.file.Files.createTempDirectory("q53-ivf").toString
      ops.Ivf.writeIndex(emb, model, idx)
      ops.Ivf.topKIndexed(idx, emb.where(col("vec_id") < 8), k = 5, model,
        nprobe = model.nCells)
    }),

    // Deterministic hash-split sampling (train/val/held-out cuts): md5 of
    // the id → stable bucket, reproducible across runs/engines/retries
    // (never rand()). Distribution + per-split token volume.
    // Mixture REBALANCING: derive per-source keep-rates from the corpus
    // so the sample hits target language proportions at the largest size
    // achievable without upsampling (scale = min n/w; the scarcest lang
    // keeps 100%) — the source-mixing step every pretraining pipeline
    // runs, as one count + broadcast rates + a pure hash filter (the
    // corpus never shuffles). DuckDB recomputes the same rates and the
    // same md5 threshold analytically.
    "q135_mixture_sample" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ops.Sampling.mixture(docs, col("doc_id"), col("lang"),
        Seq("en" -> 0.4, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1, "fr" -> 0.1))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(ops.TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    "q42_hash_split" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      docs.withColumn("split", ops.TextOps.hashSplit(col("doc_id"), 10))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(ops.TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
    }),

    // Text analysis: token counts, quality, language-ID, fingerprint.
    "q27_text_analyze" -> ((s, dir) =>
      ops.TextOps.analyze(tbl(s, dir, "documents"))),

    // Grouping sets: ROLLUP over (returnflag, linestatus) — subtotals and
    // grand total in one pass (Expand + single aggregate in Spark).
    "q32_rollup" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec("l_extendedprice")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))),

    // CUBE: all grouping-set combinations in one pass.
    "q34_cube" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(dec("o_totalprice")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))),

    // Deterministic top-k: ORDER BY with an id tiebreak + LIMIT.
    "q33_topk_orders" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // Salted two-phase aggregation over a skewed key (event_type is a
    // handful of hot values): result identical to a direct groupBy, but
    // each hot key spreads over 32 reducers in phase 1.
    "q28_skew_salted_agg" -> ((s, dir) =>
      ops.Skew.saltedAggregate(
        tbl(s, dir, "events"),
        Seq("event_type"),
        Seq(ops.Skew.SaltedAgg.sum_(col("value").cast("decimal(18,2)"), "sum_value"),
          ops.Skew.SaltedAgg.countStar("n"),
          ops.Skew.SaltedAgg.max_(col("value"), "max_value")),
        salts = 32)
        .select(col("event_type"), col("sum_value").cast("double").as("sum_value"),
          col("n"), col("max_value"))),

    // Multimodal plumbing (binary payload + typed metadata; STUB codec):
    // batched per-partition feature extraction and frame sampling. The
    // library API returns a typed float feature vector; the GATED query
    // emits the histogram as exploded exact integer bin counts
    // (round(f·n_bytes) is exact for counts ≪ 2^23) so the driver can
    // sort/hash it and DuckDB can mirror it from the ASCII document bytes.
    "q50_multimodal_features" -> ((s, dir) =>
      ops.Multimodal.extractFeatures(
        ops.Multimodal.fakeMediaFromDocs(tbl(s, dir, "documents")))
        .select(col("media_id"), col("format"), col("n_bytes"),
          posexplode(col("features")).as(Seq("bin", "f")))
        .select(col("media_id"), col("format"), col("n_bytes"), col("bin"),
          round(col("f") * col("n_bytes")).cast("long").as("bin_count"))),

    // Frame payloads are ASCII slices here, so the gated query exports them
    // as STRING for a cross-engine (DuckDB substr) hash match; library
    // callers keep the binary column.
    "q51_multimodal_frames" -> ((s, dir) =>
      ops.Multimodal.sampleFrames(
        ops.Multimodal.fakeMediaFromDocs(tbl(s, dir, "documents")), everyN = 2)
        .withColumn("frame_payload", col("frame_payload").cast("string"))),

    // REAL image decode (JDK javax.imageio, no external libs): encode a
    // deterministic grayscale PNG per doc, DECODE it back, and gate the
    // per-image pixel-luminance histogram. PNG is lossless and the pixel
    // function is pure arithmetic, so DuckDB verifies the decoded pixels
    // by recomputing the arithmetic over range()-generated coordinates —
    // a wrong decode (or a byte-level fake) hash-mismatches immediately.
    "q121_multimodal_decode" -> ((s, dir) =>
      ops.Multimodal.pixelHistogram(
        ops.Multimodal.syntheticImages(tbl(s, dir, "documents"), w = 16, h = 12))
        .where(col("bin_count") > 0)),

    // REAL audio decode (javax.sound.sampled, PCM16-in-WAV — the JDK-native
    // audio container, as PNG is for images): per-clip statistics over the
    // DECODED samples; the clips are deterministic functions of doc_id, so
    // DuckDB verifies the decoded arithmetic without touching bytes —
    // proof a real codec ran end-to-end, closing the audio-stub gap the
    // same way q121 closed the image one.
    "q130_multimodal_audio" -> ((s, dir) =>
      ops.Multimodal.audioStats(
        ops.Multimodal.syntheticAudio(tbl(s, dir, "documents"), n = 256))),

    // REAL multi-frame (video-shaped) decode: multi-page TIFF via the
    // JDK's ImageIO plugin is a true lossless frame container — frame
    // sampling decodes every 2nd PAGE through the real codec (unsampled
    // pages never decode) and DuckDB verifies per-frame pixel sums
    // arithmetically. Completes the image (q121) / audio (q130) / frames
    // trio of real-codec gates.
    "q131_multimodal_frames_real" -> ((s, dir) =>
      ops.Multimodal.sampleFramesReal(
        ops.Multimodal.syntheticVideos(tbl(s, dir, "documents"),
          w = 8, h = 6, nFrames = 6), everyN = 2)),

    // MAINTAINED ANN INDEX: the IVF cell assignment (frozen create-time
    // centroids → a deterministic Catalyst expression) is just a Project,
    // so the index IS an IVM view — new vectors enter their cells and
    // deleted vectors leave under the normal delta machinery, and queries
    // hit the always-current index without re-assigning the corpus.
    // Gated with an exhaustive probe (≡ brute force, the q52 trick), so
    // DuckDB verifies the maintained index against a brute-force top-k
    // over the post-delta corpus. At 100 TB: the state is bucketed by
    // cell-friendly keys, a batch touches O(‖Δ‖) index rows, and the
    // centroids refresh on their own slower cadence (re-create).
    "q132_ivm_ann_ivf" -> ((s, dir) => {
      val store = new MemStore
      val emb = tbl(s, dir, "embeddings")
      val model = ops.Ivf.train(emb, k = 16, iters = 3)
      val v = IvmQuery.distinct(
        Project(Scan("embeddings"),
          Seq(col("vec_id"), col("embedding"),
            ops.Ivf.cellExpr(s, col("embedding"), model).as("ivf_cell"))),
        Seq("vec_id", "embedding", "ivf_cell"))
      Ivm.create("q132", v, base(s, dir), store)
      Ivm.refreshState("q132", v, base(s, dir), deltas(s, dir), store)
      val index = Ivm.read("q132", v, store)
      ops.Ivf.topKAssigned(index,
        index.where(col("vec_id") < 8).select("vec_id", "embedding"),
        k = 5, model, nprobe = model.nCells)
    }),

    // MAINTAINED PQ CODES: the q132 recipe applied to the OTHER index
    // half — frozen codebooks make [[ops.Pq.codeExpr]] a deterministic
    // Project, so the packed 8-byte code table is an IVM view: a batch
    // encodes only its own vectors, deletes drop their codes, and the
    // ADC scan always reads current codes without a per-release re-encode
    // of the corpus (at 100 TB: ~3 TB of codes that used to be rebuilt
    // nightly now absorb O(‖Δ‖) per batch). Gated exhaustively: a
    // shortlist wider than the corpus makes ADC-shortlist + exact re-rank
    // ≡ brute-force top-k over the post-delta corpus, which DuckDB
    // computes analytically — the maintained codes and the re-rank join
    // are both on the verified path.
    "q134_ivm_pq_codes" -> ((s, dir) => {
      val store = new MemStore
      val emb = tbl(s, dir, "embeddings")
      val model = ops.Pq.train(emb, m = 8, k = 16, iters = 3)
      val v = IvmQuery.distinct(
        Project(Scan("embeddings"),
          Seq(col("vec_id"), col("embedding"),
            ops.Pq.codeExpr(s, col("embedding"), model).as("pq_code"))),
        Seq("vec_id", "embedding", "pq_code"))
      Ivm.create("q134", v, base(s, dir), store)
      Ivm.refreshState("q134", v, base(s, dir), deltas(s, dir), store)
      val index = Ivm.read("q134", v, store)
      // The gate's equivalence (ADC shortlist + exact re-rank == brute
      // force) is degenerate: it holds ONLY when the shortlist spans the
      // whole post-delta corpus. Derive `rerank` from the corpus count so
      // a larger scale factor can't silently narrow the shortlist and
      // surface as a spurious hash mismatch against the exact oracle.
      val corpusN = index.count()
      require(corpusN <= Int.MaxValue - 1, s"q134 corpus too large: $corpusN")
      ops.Pq.topKRerank(
        index.select(col("vec_id").as("n_id"), col("pq_code")),
        index.select("vec_id", "embedding"),
        index.where(col("vec_id") < 8).select("vec_id", "embedding"),
        k = 5, model, rerank = corpusN.toInt)
    }),

    // Sessionization: 30-minute-gap sessions per user via window functions
    // (lag + running sum). ts stays integer nanos end-to-end; session
    // bounds exported as epoch micros BIGINT for cross-engine parity.
    "q30_events_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      tbl(s, dir, "events")
        .withColumn("new_s",
          when(col("ts") - lag(col("ts"), 1).over(byUser) > gapNs || lag(col("ts"), 1).over(byUser).isNull, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(byUser))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          org.apache.spark.sql.functions.expr("min(ts) DIV 1000").as("start_us"),
          org.apache.spark.sql.functions.expr("max(ts) DIV 1000").as("end_us"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
    }),

    // JSON field extraction from the event payload column.
    "q31_events_json" -> ((s, dir) =>
      tbl(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"),
          count(col("k")).as("n_k"),
          max(col("k")).as("max_k"))),

    // Windowed event aggregation (batch form of the streaming op).
    // events.ts is parquet TIMESTAMP(NANOS): read as long nanos (legacy
    // conf, set in our session builders) and converted with integer DIV —
    // a double division would lose precision above 2^53 ns.
    "q29_events_hourly" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(date_trunc("hour", timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
          .as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))),

    // As-of join: each click's most recent preceding view by the same
    // user (inclusive), plus the running count of prior views — one
    // window pass over a union, single shuffle on user_id, no join.
    "q36_asof_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val clicks = e.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = e.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"))
      graft.ops.Temporal.asOfJoin(clicks, views, Seq("user_id"), "ts", "ts")
        .select(col("event_id"),
          org.apache.spark.sql.functions.expr("asof_ts DIV 1000").as("prev_view_us"),
          col("asof_n").as("n_prior_views"))
    }),

    // Keyless band join: views within the hour before each click — the
    // theta predicate becomes an equi-join on hour-chunks (each interval
    // spans ≤ 2 chunks), so it shuffles instead of going cartesian.
    "q37_range_join" -> ((s, dir) => {
      val e = tbl(s, dir, "events")
      val hourNs = 3600L * 1000 * 1000 * 1000
      val clicks = e.where(col("event_type") === "click")
        .select(col("event_id"), col("ts"))
      val views = e.where(col("event_type") === "view")
        .select(col("ts").as("vts"), (col("ts") + hourNs).as("vend"))
      graft.ops.Temporal
        .rangeJoin(clicks, views, "ts", "vts", "vend", chunk = hourNs,
          joinType = "left")
        .groupBy("event_id")
        .agg(count(col("r_vts")).as("n_views"),
          org.apache.spark.sql.functions.expr("max(r_vts) DIV 1000").as("last_view_us"))
    }),

    // Variance family maintained from signed second moments (Σe, Σe², n) —
    // self-maintainable under deletion like SUM, no auxiliary state. The
    // moment formula is evaluated identically on both engines, and
    // l_quantity is integer-valued, so the sums (and hence the derived
    // variance) are bit-exact.
    "q47_ivm_var_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
        Seq(VarSamp(col("l_quantity"), "v_qty"),
          StddevSamp(col("l_quantity"), "sd_qty"),
          VarPop(col("l_quantity"), "vp_qty"), CountStar("cnt")))
      Ivm.create("q47", v, base(s, dir), store)
      Ivm.refreshState("q47", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q47", v, store)
    }),

    // WITH (CTE) through the SQL front-end: definitions fold once and
    // splice in by name (the algebra is closed under composition), here a
    // two-level CTE chain ending in a nested aggregation — maintained
    // against the orders delta.
    "q48_immv_cte" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q48 AS
           WITH pricey AS (
             SELECT o_custkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS p
             FROM orders WHERE o_totalprice > 100000
           ),
           percust AS (
             SELECT k, COUNT(*) AS n, SUM(p) AS amt FROM pricey GROUP BY k
           )
           SELECT n, COUNT(*) AS dist, SUM(amt) AS total
           FROM percust GROUP BY n""")
      Ivm.create("q48", v, base(s, dir), store)
      Ivm.refreshState("q48", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q48", v, store)
        .select(col("n"), col("dist"), col("total").cast("double").as("total"))
    }),

    // SQL FILTER (WHERE …) clause on aggregates: folds to a CASE-WHEN-
    // guarded argument (rows failing the predicate contribute NULL, which
    // every aggregate's null guard already ignores), so the standard
    // equivalence makes filtered aggregates maintainable under deletion
    // with zero new delta machinery. AVG stays on the integer-valued
    // l_quantity so both engines sum exactly and divide once.
    "q68_immv_agg_filter" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q68 AS
           SELECT l_returnflag,
                  SUM(l_quantity) FILTER (WHERE l_linestatus = 'F') AS qty_f,
                  COUNT(*) FILTER (WHERE l_quantity > 25) AS cnt_big,
                  AVG(l_quantity) FILTER (WHERE l_tax > 0.03) AS avg_taxed,
                  COUNT(*) AS cnt
           FROM lineitem GROUP BY l_returnflag""")
      Ivm.create("q68", v, base(s, dir), store)
      Ivm.refreshState("q68", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q68", v, store)
    }),

    // ------------- maintained TPC-H pack (the queries users actually run;
    // all through the SQL front-end, maintained under both-table deltas).
    // Money expressions stay in narrow DECIMALs sized to the data
    // (extendedprice<=105k -> 12,2; discount/tax<=0.10 -> 4,2; the literal
    // 1 cast to 3,2 keeps Spark's decimal-precision growth under the
    // 38-digit cap with no rounding), so both engines sum exactly in any
    // order and the gate compares one final double cast.

    // TPC-H Q1: pricing summary over lineitem (avg_price/avg_disc shapes
    // are the q16 AVG path; the gate keeps the exactly-summable ones).
    "q69_tpch_q1" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q69 AS
           SELECT l_returnflag, l_linestatus,
                  SUM(l_quantity) AS sum_qty,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sum_base_price,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS sum_disc_price,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) *
                      (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2))))
                    AS sum_charge,
                  AVG(l_quantity) AS avg_qty,
                  COUNT(*) AS count_order
           FROM lineitem
           WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
           GROUP BY l_returnflag, l_linestatus""")
      Ivm.create("q69", v, base(s, dir), store)
      Ivm.refreshState("q69", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q69", v, store)
        .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
          col("sum_base_price").cast("double").as("sum_base_price"),
          col("sum_disc_price").cast("double").as("sum_disc_price"),
          col("sum_charge").cast("double").as("sum_charge"),
          col("avg_qty"), col("count_order"))
    }),

    // TPC-H Q3 (adapted to the synthetic schema: o_orderpriority for the
    // missing o_shippriority): 3-way join + grouped revenue, maintained
    // with deltas on BOTH orders and lineitem. Sub-selects align the join
    // key names, the shape the frontend's USING surface expects.
    "q70_tpch_q3" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q70 AS
           SELECT o_orderkey,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS revenue,
                  o_orderdate, o_orderpriority
           FROM (SELECT c_custkey AS o_custkey FROM customer
                 WHERE c_mktsegment = 'BUILDING') c
           JOIN (SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
                 FROM orders
                 WHERE o_orderdate < TIMESTAMP '1998-07-01 00:00:00') o
             USING (o_custkey)
           JOIN (SELECT l_orderkey AS o_orderkey, l_extendedprice, l_discount
                 FROM lineitem
                 WHERE l_shipdate > TIMESTAMP '1998-07-01 00:00:00') l
             USING (o_orderkey)
           GROUP BY o_orderkey, o_orderdate, o_orderpriority""")
      Ivm.create("q70", v, base(s, dir), store)
      Ivm.refreshState("q70", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q70", v, store)
        .select(col("o_orderkey"), col("revenue").cast("double").as("revenue"),
          col("o_orderdate"), col("o_orderpriority"))
    }),

    // TPC-H Q6: global forecast-revenue aggregate behind a conjunctive
    // band filter — the filter prunes the delta before any state work.
    "q71_tpch_q6" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q71 AS
           SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      CAST(l_discount AS DECIMAL(4,2))) AS revenue,
                  COUNT(*) AS cnt
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             AND l_discount BETWEEN 0.02 AND 0.06
             AND l_quantity < 24""")
      Ivm.create("q71", v, base(s, dir), store)
      Ivm.refreshState("q71", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q71", v, store)
        .select(col("revenue").cast("double").as("revenue"), col("cnt"))
    }),

    // CROSS-BATCH multi-table maintenance under the oracle: batch 1
    // applies the orders delta alone, batch 2 the lineitem delta alone.
    // Batch 2's Δlineitem must join orders AS OF batch 1 (base ⊎ Δorders,
    // read from the per-table delta accumulator) — the interaction the
    // one-batch join formula misses. The oracle applies both deltas.
    "q73_ivm_crossbatch" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(
        Join(
          Project(Scan("orders"), Seq(col("o_orderkey").as("k"),
            col("o_orderpriority"))),
          Project(Scan("lineitem"), Seq(col("l_orderkey").as("k"),
            col("l_quantity"))),
          Seq("k")),
        Seq("o_orderpriority"),
        Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt")))
      Ivm.create("q73", v, base(s, dir), store)
      Ivm.refreshState("q73", v, base(s, dir),
        t => if (t == "orders") Some(deltaOrders(s, dir)) else None, store)
      Ivm.refreshState("q73", v, base(s, dir),
        t => if (t == "lineitem") Some(deltaLineitem(s, dir)) else None, store)
      Ivm.read("q73", v, store)
    }),

    // Event-time tumbling-window aggregation as a MAINTAINED view: the
    // window bucket is a computed group key (Project below the Aggregate),
    // so late/retracted events adjust exactly the touched hour buckets —
    // the batch twin of the streaming windowed-agg path, under the oracle
    // gate with inserts AND deletes.
    "q49_ivm_window_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(
        Project(Scan("events"), Seq(
          date_trunc("hour",
            timestamp_micros(org.apache.spark.sql.functions.expr("ts DIV 1000")))
            .as("hour"),
          col("event_type"), col("value"), col("user_id"))),
        Seq("hour", "event_type"),
        Seq(CountStar("n_events"),
          Sum(col("value").cast("decimal(18,2)"), "sum_value"),
          CountDistinct(col("user_id"), "n_users")))
      Ivm.create("q49", v, base(s, dir), store)
      Ivm.refreshState("q49", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q49", v, store)
        .select(col("hour"), col("event_type"), col("n_events"),
          col("sum_value").cast("double").as("sum_value"), col("n_users"))
    }),

    // Maintained TOP-K: ORDER BY + LIMIT composes with maintenance at read
    // time — the maintained SPJ multiset absorbs inserts/deletes in O(‖Δ‖),
    // and the top-k read is TakeOrderedAndProject over the state (per-
    // partition heap + driver merge of k rows, never a full sort).
    "q54_ivm_topk_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Project(
        Filter(Scan("orders"), col("o_orderkey") % 2 === 1),
        Seq(col("o_orderkey"), col("o_custkey"), col("o_totalprice")))
      Ivm.create("q54", v, base(s, dir), store)
      Ivm.refreshState("q54", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q54", v, store)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // ORDER BY + LIMIT through CREATE IMMV: folds to the TopK read
    // decoration — the child multiset is maintained (deletes can promote
    // runners-up), the ranking plans as TakeOrderedAndProject at read.
    "q78_immv_topk" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q78 AS
           SELECT o_orderkey, o_custkey, o_totalprice
           FROM orders WHERE o_orderkey % 2 = 1
           ORDER BY o_totalprice DESC, o_orderkey ASC
           LIMIT 10""")
      Ivm.create("q78", v, base(s, dir), store)
      Ivm.refreshState("q78", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q78", v, store)
    }),

    // Multi-view SHARED-STATE maintenance under the oracle gate: two views
    // over the same per-customer order counts (the Q13 interior) share ONE
    // content-addressed interior state, refreshed once per batch; the gate
    // reads the Q13 histogram view, whose oracle is the q14 SQL.
    "q67_ivm_shared_apply" -> ((s, dir) => {
      val store = new MemStore
      val interior = Aggregate(
        LeftJoin(
          Project(Scan("customer"), Seq(col("c_custkey").as("custkey"))),
          Project(Scan("orders"), Seq(col("o_custkey").as("custkey"),
            col("o_orderkey"))),
          Seq("custkey")),
        Seq("custkey"), Seq(Count(col("o_orderkey"), "c_count")))
      val hist = Aggregate(interior, Seq("c_count"), Seq(CountStar("custdist")))
      val tot = Aggregate(interior, Seq.empty,
        Seq(Sum(col("c_count"), "torders"), CountStar("ncust")))
      val views = Map("hist" -> hist, "tot" -> tot)
      Ivm.createShared(views, base(s, dir), store)
      Ivm.refreshShared(views, base(s, dir), deltas(s, dir), store)
      Ivm.readShared(hist, store)
    }),

    // INCREMENTAL DEDUP MAINTENANCE: the keep-one-per-digest table as a
    // maintained view — document inserts/deletes update keep decisions in
    // O(‖Δ‖) (deleting the kept copy falls back to the next-lowest id via
    // the MIN aux multiset) instead of re-hashing the corpus.
    "q65_ivm_dedup_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(
        Project(Scan("documents"), Seq(md5(col("text")).as("h"), col("doc_id"))),
        Seq("h"), Seq(Min(col("doc_id"), "keep_id"), CountStar("n_copies")))
      Ivm.create("q65", v, base(s, dir), store)
      Ivm.refreshState("q65", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q65", v, store)
    }),

    // Maintained per-language corpus statistics: language-ID and token
    // count are deterministic Catalyst expressions, so they ride the delta
    // rules as computed group key / aggregate input — corpus dashboards
    // stay fresh under document churn without rescans.
    "q66_ivm_corpus_stats_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(
        Project(Scan("documents"), Seq(
          ops.TextOps.langId(col("text")).as("pred_lang"),
          ops.TextOps.nTokens(col("text")).cast("long").as("toks"))),
        Seq("pred_lang"),
        Seq(Sum(col("toks"), "n_tokens"), CountStar("n_docs")))
      Ivm.create("q66", v, base(s, dir), store)
      Ivm.refreshState("q66", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q66", v, store)
    }),

    // The composed data-curation pipeline a 100 TB pretraining run
    // executes, end-to-end and oracle-gated: deterministic hash sample →
    // quality/language scoring → quality gate → exact near-dup removal
    // (keep lowest doc_id per text digest) → per-language corpus stats.
    // Every stage is a zero-or-one-shuffle deterministic op; thresholding
    // on `quality` is engine-safe because the score itself hash-matches
    // DuckDB bit-for-bit (q27).
    "q63_curation_pipeline" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      val sampled = ops.Sampling.uniform(docs, col("doc_id"), 80)
      val scored = ops.TextOps.analyze(sampled)
        .where(col("quality") > 0.5)
      val keep = sampled.select(col("doc_id"), md5(col("text")).as("h"))
        .join(scored.select("doc_id"), "doc_id")
        .groupBy("h").agg(min("doc_id").as("doc_id"))
      scored.join(keep.select("doc_id"), "doc_id")
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("n_tokens"),
          round(avg(col("quality")), 6).as("avg_quality"))
    }),

    // Correlated EXISTS folds to the maintained semi join: customers keep
    // membership while at least one qualifying order is alive. The
    // correlation aliases o_custkey to the outer name (same-name key rule).
    "q61_ivm_exists" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q61 AS
           SELECT c_mktsegment, COUNT(*) AS n FROM customer
           WHERE EXISTS (
             SELECT 1 FROM
               (SELECT o_custkey AS c_custkey, o_totalprice FROM orders) o
             WHERE o.c_custkey = customer.c_custkey
               AND o_totalprice > 150000)
           GROUP BY c_mktsegment""")
      Ivm.create("q61", v, base(s, dir), store)
      Ivm.refreshState("q61", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q61", v, store)
    }),

    // NOT EXISTS → the maintained anti composition (same machinery as
    // NOT IN): customers whose last qualifying order dies enter the view.
    "q62_ivm_not_exists" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q62 AS
           SELECT c_mktsegment, COUNT(*) AS n FROM customer
           WHERE NOT EXISTS (
             SELECT 1 FROM
               (SELECT o_custkey AS c_custkey, o_totalprice FROM orders) o
             WHERE o.c_custkey = customer.c_custkey
               AND o_totalprice > 150000)
           GROUP BY c_mktsegment""")
      Ivm.create("q62", v, base(s, dir), store)
      Ivm.refreshState("q62", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q62", v, store)
    }),

    // Maintained GROUP BY ROLLUP: one aggregate state per grouping level,
    // null-extended and bag-unioned (Δ(A⊎B)=ΔA⊎ΔB) — subtotals and the
    // grand total all stay incrementally maintained through one batch of
    // inserts+deletes.
    "q59_ivm_rollup_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = IvmQuery.rollup(Scan("lineitem"),
        Seq("l_returnflag" -> "string", "l_linestatus" -> "string"),
        Seq(Sum(col("l_quantity"), "sq"), CountStar("n")))
      Ivm.create("q59", v, base(s, dir), store)
      Ivm.refreshState("q59", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q59", v, store)
    }),

    // SQL GROUP BY ROLLUP through CREATE IMMV: the parser's grouping-set
    // expression folds to the maintained per-level composition (q59's
    // API path); subtotal NULL keys type through union coercion.
    "q76_immv_rollup" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q76 AS
           SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sq,
                  COUNT(*) AS n
           FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""")
      Ivm.create("q76", v, base(s, dir), store)
      Ivm.refreshState("q76", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q76", v, store)
    }),

    // SQL GROUPING SETS through CREATE IMMV: arbitrary level lists fold
    // to the same maintained per-level composition (ROLLUP/CUBE are its
    // prefix/power-set instances).
    "q77_immv_grouping_sets" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q77 AS
           SELECT o_orderstatus, o_orderpriority,
                  GROUPING(o_orderstatus) AS g_status,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp,
                  COUNT(*) AS n
           FROM orders
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderpriority), ())""")
      Ivm.create("q77", v, base(s, dir), store)
      Ivm.refreshState("q77", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q77", v, store)
        .select(col("o_orderstatus"), col("o_orderpriority"), col("g_status"),
          col("sp").cast("double").as("sp"), col("n"))
    }),

    // Maintained GROUP BY CUBE — the rollup composition over all 2^k key
    // subsets; four aggregate states refresh from one orders batch.
    "q60_ivm_cube_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = IvmQuery.cube(Scan("orders"),
        Seq("o_orderstatus" -> "string", "o_orderpriority" -> "string"),
        Seq(Sum(dec("o_totalprice"), "sum_price"), CountStar("n")))
      Ivm.create("q60", v, base(s, dir), store)
      Ivm.refreshState("q60", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q60", v, store)
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("sum_price").cast("double").as("sum_price"), col("n"))
    }),

    // NOT IN (subquery) folds to the maintained ANTI-join composition:
    // orders crossing the price threshold via inserts/deletes flip their
    // lineitems in/out of the view through the LeftJoin match-count
    // machinery — deltas arrive on BOTH tables in the same batch.
    "q58_ivm_not_in" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q58 AS
           SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sq FROM (
             SELECT l_returnflag, l_quantity FROM lineitem
             WHERE l_orderkey NOT IN
               (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000)
           ) GROUP BY l_returnflag""")
      Ivm.create("q58", v, base(s, dir), store)
      Ivm.refreshState("q58", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q58", v, store)
    }),

    // MIN_BY/MAX_BY with deterministic ties (arg of the lexicographic
    // (value, arg) extremum pair), maintained under deletion through the
    // pair-struct aux multiset — deleting the current extremum row falls
    // back to the runner-up pair without rescanning the base.
    "q56_ivm_argminmax_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
        Seq(MinBy(col("l_quantity"), col("l_orderkey"), "cheapest_order"),
          MaxBy(col("l_quantity"), col("l_orderkey"), "biggest_order"),
          CountStar("cnt")))
      Ivm.create("q56", v, base(s, dir), store)
      Ivm.refreshState("q56", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q56", v, store)
    }),

    // Exact percentiles (linear interpolation at position p·(n−1), the
    // definition shared by Spark's percentile and DuckDB's quantile_cont);
    // rounded to 6 dp on both engines to absorb last-ulp interpolation
    // differences. At 100 TB one would switch to approx_percentile
    // (t-digest) — exact percentile is the verification baseline here,
    // same pattern as brute-force vs IVF ANN.
    "q57_percentiles" -> ((s, dir) =>
      tbl(s, dir, "events").groupBy("event_type")
        .agg(
          round(org.apache.spark.sql.functions.expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(org.apache.spark.sql.functions.expr("percentile(value, 0.9D)"), 6).as("p90"),
          round(org.apache.spark.sql.functions.expr("percentile(value, 0.99D)"), 6).as("p99"),
          count(lit(1)).as("n"))),

    // MAINTAINED percentiles: holistic aggregates (quantiles, mode) are
    // not incrementally summarizable — the value multiset IS their minimal
    // state. The SPJ view absorbs deltas in O(‖Δ‖); the read computes the
    // percentile over the maintained multiset, exactly what any engine
    // pays to evaluate a quantile. Deletes shift the quantile correctly
    // (rows leave the multiset).
    "q79_ivm_percentile_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Project(Scan("events"), Seq(col("event_type"), col("value")))
      Ivm.create("q79", v, base(s, dir), store)
      Ivm.refreshState("q79", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q79", v, store).groupBy("event_type")
        .agg(
          round(org.apache.spark.sql.functions.expr("percentile(value, 0.5D)"), 6).as("p50"),
          round(org.apache.spark.sql.functions.expr("percentile(value, 0.9D)"), 6).as("p90"),
          count(lit(1)).as("n"))
    }),

    // MAINTAINED MODE (most frequent value) — same minimal-state pattern
    // as q79: the multiset absorbs deltas; the read ranks (count desc,
    // value asc) per group, deterministic on both engines.
    "q81_ivm_mode_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Project(Scan("events"), Seq(col("event_type"), col("value")))
      Ivm.create("q81", v, base(s, dir), store)
      Ivm.refreshState("q81", v, base(s, dir), deltas(s, dir), store)
      val counts = Ivm.read("q81", v, store)
        .groupBy("event_type", "value").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type")
        .orderBy(col("cnt").desc, col("value").asc)
      counts.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("event_type"), col("value").as("mode_value"), col("cnt"))
    }),

    // MAINTAINED covariance/correlation — cross-moment state (Σx, Σy,
    // Σxy, Σx², Σy², pair count), weight-linear like variance, folded
    // from SQL. Integer-valued inputs keep the moments exact in double,
    // so refresh ≡ recompute ≡ the oracle bit-for-bit.
    "q82_ivm_corr_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q82 AS
           SELECT l_returnflag,
                  covar_pop(l_quantity, l_linenumber) AS cov_p,
                  covar_samp(l_quantity, l_linenumber) AS cov_s,
                  corr(l_quantity, l_linenumber) AS r,
                  COUNT(*) AS cnt
           FROM lineitem GROUP BY l_returnflag""")
      Ivm.create("q82", v, base(s, dir), store)
      Ivm.refreshState("q82", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q82", v, store)
    }),

    // MAINTAINED RANGE (banded theta) JOIN through SQL: residual ON
    // conjuncts fold to a Filter over the equi join — Δ(σ(A⋈B)) = σ(Δ(A⋈B))
    // — so "lineitems shipped within 30 days of their order's date" stays
    // maintained under deltas on BOTH tables. The equi key keeps the join
    // partitioned at scale; only the band predicate is theta.
    "q85_ivm_range_join" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q85 AS
           SELECT k, l_linenumber, l_quantity
           FROM (SELECT o_orderkey AS k, o_orderdate FROM orders) o
           JOIN (SELECT l_orderkey AS k, l_linenumber, l_quantity,
                        l_shipdate FROM lineitem) l
           ON o.k = l.k AND l.l_shipdate >= o.o_orderdate
              AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY""")
      Ivm.create("q85", v, base(s, dir), store)
      Ivm.refreshState("q85", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q85", v, store)
    }),

    // Share-of-total via a SELECT-list scalar subquery: every row's share
    // shifts when the total moves (inherently O(view) rewrite — the
    // cancellation machinery still dedupes the unchanged-qualification
    // case for WHERE-form subqueries; here values genuinely change).
    // WINDOW FUNCTIONS over a maintained view: the aggregate core refreshes
    // in O(‖Δ‖); RANK / SUM OVER () apply at read over the maintained state
    // (window values are whole-relation functions — not Z-linear — so
    // read-time evaluation over state is the correct split; cost is
    // O(|view|) at read, the same any engine pays, never a base rescan).
    "q87_ivm_window_rank" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q87 AS
           SELECT l_returnflag, sum_qty,
                  CAST(RANK() OVER (ORDER BY sum_qty DESC, l_returnflag)
                       AS BIGINT) AS rnk,
                  sum_qty / SUM(sum_qty) OVER () AS share
           FROM (SELECT l_returnflag, SUM(l_quantity) AS sum_qty
                 FROM lineitem GROUP BY l_returnflag)""")
      Ivm.create("q87", v, base(s, dir), store)
      Ivm.refreshState("q87", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q87", v, store)
    }),

    // SELF-JOIN maintenance: the same base table feeds BOTH join sides, so
    // one delta batch drives every delta term at once — ΔA⋈A, A⋈ΔA, and
    // the ΔA⋈ΔA corner (delta rows pairing with themselves). Within-order
    // line pairs, counted per order.
    "q88_ivm_self_join" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q88 AS
           SELECT k, COUNT(*) AS pairs
           FROM (SELECT l_orderkey AS k, l_linenumber AS la FROM lineitem) x
           JOIN (SELECT l_orderkey AS k, l_linenumber AS lb FROM lineitem) y
             ON x.k = y.k
           WHERE la < lb
           GROUP BY k""")
      Ivm.create("q88", v, base(s, dir), store)
      Ivm.refreshState("q88", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q88", v, store)
    }),

    // BAG SET-OPS, maintained: INTERSECT ALL keeps min(multA, multB)
    // copies, EXCEPT ALL keeps multA−multB clamped at 0. Each side's
    // per-row multiplicity is an ordinary COUNT(*) aggregate state
    // (O(‖Δ‖) refresh); min / clamped difference are scalars over the
    // joined counts; the expansion happens at read. One lineitem delta
    // moves BOTH sides' counts in the same batch.
    "q89_ivm_intersect_all" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q89 AS
           SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'R'
           INTERSECT ALL
           SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'A'""")
      Ivm.create("q89", v, base(s, dir), store)
      Ivm.refreshState("q89", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q89", v, store)
    }),

    "q90_ivm_except_all" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q90 AS
           SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'R'
           EXCEPT ALL
           SELECT l_quantity AS q FROM lineitem WHERE l_returnflag = 'A'""")
      Ivm.create("q90", v, base(s, dir), store)
      Ivm.refreshState("q90", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q90", v, store)
    }),

    // BOOLEAN REDUCTIONS — BOOL_AND/BOOL_OR maintained from two signed
    // counts (true count, non-null count); pure SUM-style self-maintenance,
    // no auxiliary multiset, deletes flip the output when a count crosses
    // its threshold.
    "q91_ivm_bool_agg" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q91 AS
           SELECT l_returnflag,
                  BOOL_AND(l_quantity < 49) AS all_small,
                  BOOL_OR(l_discount > 0.09) AS any_deep,
                  COUNT(*) AS n
           FROM lineitem GROUP BY l_returnflag""")
      Ivm.create("q91", v, base(s, dir), store)
      Ivm.refreshState("q91", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q91", v, store)
    }),

    // MAINTAINED MEDIAN/PERCENTILE as first-class AGGREGATES (q79 keeps
    // the multiset-at-read composition; here the quantile is a view
    // column): holistic, so the aux (group, value) multiset is the state,
    // and a touched group's new value is one frequency-weighted
    // percentile over its alive values — O(distinct values), no rescan.
    "q92_ivm_median_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q92 AS
           SELECT event_type, MEDIAN(value) AS med,
                  PERCENTILE(value, 0.9) AS p90, COUNT(*) AS n
           FROM events GROUP BY event_type""")
      Ivm.create("q92", v, base(s, dir), store)
      Ivm.refreshState("q92", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q92", v, store).select(col("event_type"),
        round(col("med"), 6).as("med"), round(col("p90"), 6).as("p90"),
        col("n"))
    }),

    // ---- TPC-H pack, round 4: the join-heavy quarter of the benchmark
    // run through CREATE IMMV and maintained under the standard delta mix
    // (lineitem + orders feeds; dimensions static). Money math follows the
    // q69-q71 parity rules (DECIMAL in-state, one DOUBLE cast at the edge).

    // TPC-H Q4 (adapted: no l_commitdate in the fixture — the EXISTS
    // probes high-quantity lines instead): priority census of orders that
    // have at least one qualifying line. Correlated EXISTS folds to the
    // maintained semi composition; deltas hit BOTH the outer orders scan
    // and the subquery's lineitem scan in the same batch.
    "q93_tpch_q4" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q93 AS
           SELECT o_orderpriority, COUNT(*) AS order_count
           FROM (SELECT o_orderkey, o_orderpriority FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') o
           WHERE EXISTS (
             SELECT 1 FROM
               (SELECT l_orderkey AS o_orderkey, l_quantity FROM lineitem) l
             WHERE l.o_orderkey = o.o_orderkey AND l_quantity > 45)
           GROUP BY o_orderpriority""")
      Ivm.create("q93", v, base(s, dir), store)
      Ivm.refreshState("q93", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q93", v, store)
    }),

    // TPC-H Q5 (local-supplier volume): the full 6-table star — customer ⋈
    // orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region — with the
    // cross-branch equality c_nationkey = s_nationkey expressed as a
    // two-key USING join (the rename-to-shared-name discipline makes every
    // equi edge a co-partitionable key set; at scale each hop hashes on
    // its keys and the three dimension legs broadcast). Deltas on orders +
    // lineitem drive the two fact edges, including the Δ⋈Δ term.
    "q94_tpch_q5" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q94 AS
           SELECT n_name,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS revenue
           FROM (SELECT c_custkey AS o_custkey, c_nationkey AS s_nationkey
                 FROM customer) c
           JOIN (SELECT o_orderkey, o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') o
             USING (o_custkey)
           JOIN (SELECT l_orderkey AS o_orderkey, l_suppkey AS s_suppkey,
                        l_extendedprice, l_discount FROM lineitem) l
             USING (o_orderkey)
           JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
             USING (s_suppkey, s_nationkey)
           JOIN (SELECT n_nationkey AS s_nationkey, n_name,
                        n_regionkey AS r_regionkey FROM nation) n
             USING (s_nationkey)
           JOIN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA') r
             USING (r_regionkey)
           GROUP BY n_name""")
      Ivm.create("q94", v, base(s, dir), store)
      Ivm.refreshState("q94", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q94", v, store)
        .select(col("n_name"), col("revenue").cast("double").as("revenue"))
    }),

    // TPC-H Q10 (returned-item reporting): 4-table join, wide group key,
    // and the classic ORDER BY revenue DESC LIMIT 20 — which folds to the
    // maintained-child + TopK read decoration (deletions inside the top 20
    // promote runners-up from the maintained full aggregate, never a
    // rescan). c_custkey tiebreak keeps the cut deterministic.
    "q95_tpch_q10" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q95 AS
           SELECT c_custkey, c_name, c_acctbal, n_name,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS revenue
           FROM (SELECT c_custkey, c_name, c_acctbal,
                        c_nationkey AS n_nationkey FROM customer) c
           JOIN (SELECT o_orderkey, o_custkey AS c_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00') o
             USING (c_custkey)
           JOIN (SELECT l_orderkey AS o_orderkey, l_extendedprice, l_discount
                 FROM lineitem WHERE l_returnflag = 'R') l
             USING (o_orderkey)
           JOIN (SELECT n_nationkey, n_name FROM nation) n
             USING (n_nationkey)
           GROUP BY c_custkey, c_name, c_acctbal, n_name
           ORDER BY revenue DESC, c_custkey LIMIT 20""")
      Ivm.create("q95", v, base(s, dir), store)
      Ivm.refreshState("q95", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q95", v, store)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"), col("revenue").cast("double").as("revenue"))
    }),

    // TPC-H Q12 (adapted: no l_shipmode — priority mix of high-quantity
    // lines): CASE-conditional aggregates over a fact-fact join, both
    // branches maintained as ordinary signed SUM states.
    "q96_tpch_q12" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q96 AS
           SELECT l_linestatus,
                  SUM(CASE WHEN o_orderpriority = '1-URGENT'
                             OR o_orderpriority = '2-HIGH'
                           THEN 1 ELSE 0 END) AS high_count,
                  SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                            AND o_orderpriority <> '2-HIGH'
                           THEN 1 ELSE 0 END) AS low_count,
                  COUNT(*) AS n
           FROM (SELECT o_orderkey, o_orderpriority FROM orders) o
           JOIN (SELECT l_orderkey AS o_orderkey, l_linestatus FROM lineitem
                 WHERE l_quantity >= 30) l
             USING (o_orderkey)
           GROUP BY l_linestatus""")
      Ivm.create("q96", v, base(s, dir), store)
      Ivm.refreshState("q96", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q96", v, store)
    }),

    // TPC-H Q18 (large-volume customers): IN against an aggregate-then-
    // filter subquery over the SAME delta-fed lineitem that also feeds the
    // join — the keyset view maintains its per-order quantity sum and the
    // semi composition reacts when an order crosses the 270 threshold in
    // either direction.
    "q97_tpch_q18" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q97 AS
           SELECT c_name, c_custkey, o_orderkey, o_totalprice,
                  SUM(l_quantity) AS sum_qty
           FROM (SELECT c_custkey, c_name FROM customer) c
           JOIN (SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice
                 FROM orders) o
             USING (c_custkey)
           JOIN (SELECT l_orderkey AS o_orderkey, l_quantity FROM lineitem) l
             USING (o_orderkey)
           WHERE o_orderkey IN (
             SELECT o_orderkey FROM (
               SELECT o_orderkey, SUM(l_quantity) AS sq FROM
                 (SELECT l_orderkey AS o_orderkey, l_quantity FROM lineitem)
               GROUP BY o_orderkey)
             WHERE sq > 270)
           GROUP BY c_name, c_custkey, o_orderkey, o_totalprice""")
      Ivm.create("q97", v, base(s, dir), store)
      Ivm.refreshState("q97", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q97", v, store)
    }),

    // TPC-H Q19 (adapted to the fixture's part columns): disjunctive
    // brand/size/quantity predicate over part ⋈ lineitem — the OR of
    // conjunct bands stays ONE maintained filter over the equi join (the
    // join key carries the partitioning; the disjunction never splits the
    // plan into a union of three scans).
    "q98_tpch_q19" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q98 AS
           SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS revenue,
                  COUNT(*) AS n
           FROM (SELECT p_partkey, p_brand, p_size FROM part) p
           JOIN (SELECT l_partkey AS p_partkey, l_quantity, l_extendedprice,
                        l_discount FROM lineitem) l
             USING (p_partkey)
           WHERE (p_brand = 'Brand#11' AND p_size <= 5 AND l_quantity <= 11)
              OR (p_brand = 'Brand#22' AND p_size <= 10
                  AND l_quantity BETWEEN 10 AND 20)
              OR (p_brand = 'Brand#33' AND p_size <= 15 AND l_quantity >= 20)""")
      Ivm.create("q98", v, base(s, dir), store)
      Ivm.refreshState("q98", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q98", v, store)
        .select(col("revenue").cast("double").as("revenue"), col("n"))
    }),

    // TPC-H Q14 (promo revenue share): the view maintains the two exact
    // DECIMAL sums; the percentage is a read-time scalar over them (a
    // ratio of aggregates is not itself Z-linear — its minimal state IS
    // the two sums, so this split is the textbook one).
    "q99_tpch_q14" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q99 AS
           SELECT SUM(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                                (CAST(1 AS DECIMAL(3,2)) -
                                 CAST(l_discount AS DECIMAL(4,2)))
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo_revenue,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS total_revenue
           FROM (SELECT p_partkey, p_type FROM part) p
           JOIN (SELECT l_partkey AS p_partkey, l_extendedprice, l_discount
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
                   AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00') l
             USING (p_partkey)""")
      Ivm.create("q99", v, base(s, dir), store)
      Ivm.refreshState("q99", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q99", v, store).select(
        (lit(100.0) * col("promo_revenue").cast("double") /
          col("total_revenue").cast("double")).as("promo_pct"),
        col("promo_revenue").cast("double").as("promo_revenue"),
        col("total_revenue").cast("double").as("total_revenue"))
    }),

    // TPC-H Q15 (top supplier): the revenue CTE is a maintained aggregate,
    // its MAX is a maintained nested aggregate (aux multiset over the
    // grouped totals), and the equality filter is the WHERE-form scalar
    // subquery — when a delta moves the max, the cross-join delta term
    // requalifies rows in and out of the view.
    "q101_tpch_q15" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q101 AS
           WITH rev AS (
             SELECT l_suppkey AS s_suppkey,
                    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                        (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                      AS total
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
               AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
             GROUP BY l_suppkey)
           SELECT s_suppkey, total FROM rev
           WHERE total = (SELECT MAX(total) FROM rev)""")
      Ivm.create("q101", v, base(s, dir), store)
      Ivm.refreshState("q101", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q101", v, store)
        .select(col("s_suppkey"), col("total").cast("double").as("total"))
    }),

    // TPC-H Q2 (adapted): rows at their group's minimum — the fact table
    // joins its OWN per-key MIN aggregate and keeps the rows that touch
    // it. A delete of the current minimum promotes the runner-up (aux
    // multiset); an insert below it evicts the old winners.
    "q102_tpch_q2" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q102 AS
           SELECT p_partkey, p_brand, l_suppkey, l_extendedprice
           FROM (SELECT p_partkey, p_brand FROM part WHERE p_size = 30) p
           JOIN (SELECT l_partkey AS p_partkey, l_suppkey, l_extendedprice
                 FROM lineitem) l
             USING (p_partkey)
           JOIN (SELECT l_partkey AS p_partkey, MIN(l_extendedprice) AS minp
                 FROM lineitem GROUP BY l_partkey) m
             USING (p_partkey)
           WHERE l_extendedprice = minp""")
      Ivm.create("q102", v, base(s, dir), store)
      Ivm.refreshState("q102", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q102", v, store)
    }),

    // MAINTAINED APPROX_COUNT_DISTINCT: per-group HLL sketch state,
    // insert-only (deletes raise — registers cannot be decremented). The
    // oracle checks the exact count AND asserts the sketch estimate lands
    // within 5% of it (est_ok must hash-match DuckDB's literal TRUE), so
    // the accuracy claim is itself oracle-gated.
    "q103_ivm_approx_distinct" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q103 AS
           SELECT event_type,
                  APPROX_COUNT_DISTINCT(user_id) AS approx_users,
                  COUNT(DISTINCT user_id) AS exact_users,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""")
      Ivm.create("q103", v, base(s, dir), store)
      val insertOnly: String => Option[DataFrame] =
        t => deltas(s, dir)(t).map(_.where(col(M))) // sketches: inserts only
      Ivm.refreshState("q103", v, base(s, dir), insertOnly, store)
      Ivm.read("q103", v, store).select(col("event_type"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("est_ok"),
        col("exact_users"), col("n"))
    }),

    // TPC-H Q7 (volume shipping): the nation dim joins TWICE under two
    // renames (supplier's nation and customer's nation), the disjunctive
    // nation-pair predicate rides the 6-way join as one maintained filter,
    // and the year is a computed group key. Deltas feed lineitem AND
    // orders in the same batch.
    "q106_tpch_q7" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q106 AS
           SELECT supp_nation, cust_nation,
                  CAST(year(l_shipdate) AS BIGINT) AS l_year,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS revenue
           FROM (SELECT s_suppkey AS l_suppkey, s_nationkey FROM supplier) s
           JOIN (SELECT l_orderkey AS o_orderkey, l_suppkey, l_extendedprice,
                        l_discount, l_shipdate FROM lineitem) l
             USING (l_suppkey)
           JOIN (SELECT o_orderkey, o_custkey AS c_custkey FROM orders) o
             USING (o_orderkey)
           JOIN (SELECT c_custkey, c_nationkey FROM customer) c
             USING (c_custkey)
           JOIN (SELECT n_nationkey AS s_nationkey, n_name AS supp_nation
                 FROM nation) n1
             USING (s_nationkey)
           JOIN (SELECT n_nationkey AS c_nationkey, n_name AS cust_nation
                 FROM nation) n2
             USING (c_nationkey)
           WHERE (supp_nation = 'NATION_1' AND cust_nation = 'NATION_2')
              OR (supp_nation = 'NATION_2' AND cust_nation = 'NATION_1')
           GROUP BY supp_nation, cust_nation, l_year""")
      Ivm.create("q106", v, base(s, dir), store)
      Ivm.refreshState("q106", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q106", v, store)
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          col("revenue").cast("double").as("revenue"))
    }),

    // TPC-H Q8 (national market share): the view maintains the two exact
    // sums (one CASE-gated); the share is a read-time ratio over them —
    // the same maintained-state/read-expression split as Q14 (q99).
    "q107_tpch_q8" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q107 AS
           SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                  SUM(CASE WHEN supp_nation = 'NATION_3'
                           THEN vol ELSE CAST(0 AS DECIMAL(12,2)) END)
                    AS nation_vol,
                  SUM(vol) AS total_vol
           FROM (
             SELECT o_orderdate, supp_nation,
                    CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                      AS vol
             FROM (SELECT p_partkey FROM part WHERE p_type = 'ECONOMY') p
             JOIN (SELECT l_partkey AS p_partkey, l_orderkey AS o_orderkey,
                          l_suppkey, l_extendedprice, l_discount
                   FROM lineitem) l
               USING (p_partkey)
             JOIN (SELECT o_orderkey, o_custkey AS c_custkey, o_orderdate
                   FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                     AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') o
               USING (o_orderkey)
             JOIN (SELECT c_custkey, c_nationkey AS cn_key FROM customer) c
               USING (c_custkey)
             JOIN (SELECT n_nationkey AS cn_key, n_regionkey AS r_regionkey
                   FROM nation) nc
               USING (cn_key)
             JOIN (SELECT r_regionkey FROM region WHERE r_name = 'AMERICA') r
               USING (r_regionkey)
             JOIN (SELECT s_suppkey AS l_suppkey, s_nationkey AS sn_key
                   FROM supplier) sp
               USING (l_suppkey)
             JOIN (SELECT n_nationkey AS sn_key, n_name AS supp_nation
                   FROM nation) ns
               USING (sn_key)
           )
           GROUP BY o_year""")
      Ivm.create("q107", v, base(s, dir), store)
      Ivm.refreshState("q107", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q107", v, store).select(col("o_year"),
        (col("nation_vol").cast("double") / col("total_vol").cast("double"))
          .as("mkt_share"),
        col("nation_vol").cast("double").as("nation_vol"),
        col("total_vol").cast("double").as("total_vol"))
    }),

    // TPC-H Q9 (product-type profit, adapted: revenue in place of the
    // absent ps_supplycost term): LIKE predicate on the part dim, profit
    // grouped by the supplier's nation and the computed ship year.
    "q108_tpch_q9" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q108 AS
           SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS sum_profit
           FROM (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') p
           JOIN (SELECT l_partkey AS p_partkey, l_suppkey, l_extendedprice,
                        l_discount, l_shipdate FROM lineitem) l
             USING (p_partkey)
           JOIN (SELECT s_suppkey AS l_suppkey, s_nationkey FROM supplier) sp
             USING (l_suppkey)
           JOIN (SELECT n_nationkey AS s_nationkey, n_name FROM nation) n
             USING (s_nationkey)
           GROUP BY n_name, o_year""")
      Ivm.create("q108", v, base(s, dir), store)
      Ivm.refreshState("q108", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q108", v, store)
        .select(col("n_name"), col("o_year"),
          col("sum_profit").cast("double").as("sum_profit"))
    }),

    // TPC-H Q11 (important stock, adapted to lineitem value): per-part
    // value sum filtered against a FRACTION of the global total — the
    // threshold is the WHERE-form scalar subquery over the same CTE, so
    // one delta moves both sides and rows requalify in O(delta).
    "q109_tpch_q11" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q109 AS
           WITH pv AS (
             SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                      AS v
             FROM (SELECT l_partkey, l_extendedprice, l_suppkey
                   FROM lineitem) li
             JOIN (SELECT s_suppkey AS l_suppkey FROM supplier
                   WHERE s_nationkey < 10) s
               USING (l_suppkey)
             GROUP BY l_partkey)
           SELECT l_partkey, v FROM pv
           WHERE v > (SELECT SUM(v) FROM pv) * CAST(0.0009 AS DECIMAL(6,4))""")
      Ivm.create("q109", v, base(s, dir), store)
      Ivm.refreshState("q109", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q109", v, store)
        .select(col("l_partkey"), col("v").cast("double").as("v"))
    }),

    // TPC-H Q16 (supplier relationship, adapted): COUNT(DISTINCT) over a
    // part-filtered join minus a NOT IN supplier blocklist — the distinct
    // count reacts when a supplier's last qualifying line dies, and the
    // blocklist is a maintained anti keyset.
    "q110_tpch_q16" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q110 AS
           SELECT p_brand, p_size,
                  COUNT(DISTINCT l_suppkey) AS supplier_cnt,
                  COUNT(*) AS n
           FROM (
             SELECT p_brand, p_size, l_suppkey FROM (
               SELECT p_brand, p_size, l_suppkey FROM
                 (SELECT p_partkey, p_brand, p_size FROM part
                  WHERE p_brand <> 'Brand#11'
                    AND p_size IN (1, 5, 9, 13, 17, 21, 25)) p
               JOIN (SELECT l_partkey AS p_partkey, l_suppkey FROM lineitem) l
                 USING (p_partkey))
             WHERE l_suppkey NOT IN (
               SELECT s_suppkey AS l_suppkey FROM supplier
               WHERE s_acctbal < 0))
           GROUP BY p_brand, p_size""")
      Ivm.create("q110", v, base(s, dir), store)
      Ivm.refreshState("q110", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q110", v, store)
    }),

    // TPC-H Q17 (small-quantity revenue): the fact joins its OWN per-part
    // quantity aggregate; the 0.2*avg comparison is done in exact integer/
    // decimal cross-multiplied form (qty*cnt*5 < sum) so both engines
    // agree bit-for-bit. The /7 is a read-time scalar.
    "q111_tpch_q17" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q111 AS
           SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS total_price,
                  COUNT(*) AS n
           FROM (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12') p
           JOIN (SELECT l_partkey AS p_partkey, l_quantity, l_extendedprice
                 FROM lineitem) l
             USING (p_partkey)
           JOIN (SELECT l_partkey AS p_partkey,
                        SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sumq,
                        COUNT(*) AS cntq
                 FROM lineitem GROUP BY l_partkey) a
             USING (p_partkey)
           WHERE CAST(l_quantity AS DECIMAL(18,2)) * cntq * 5 < sumq""")
      Ivm.create("q111", v, base(s, dir), store)
      Ivm.refreshState("q111", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q111", v, store).select(
        (col("total_price").cast("double") / 7.0).as("avg_yearly"),
        col("total_price").cast("double").as("total_price"), col("n"))
    }),

    // TPC-H Q20 (part promotion, adapted): IN against a HAVING-style
    // aggregate subquery (per-supplier quantity over LIKE-filtered parts)
    // — the keyset view maintains the sums; suppliers cross the threshold
    // in either direction under deltas.
    "q112_tpch_q20" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q112 AS
           SELECT s_suppkey, s_name FROM supplier
           WHERE s_suppkey IN (
             SELECT l_suppkey AS s_suppkey FROM (
               SELECT l_suppkey, SUM(l_quantity) AS q FROM
                 (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem) li
               JOIN (SELECT p_partkey AS l_partkey FROM part
                     WHERE p_name LIKE 'small%') pp
                 USING (l_partkey)
               GROUP BY l_suppkey)
             WHERE q > 2100)""")
      Ivm.create("q112", v, base(s, dir), store)
      Ivm.refreshState("q112", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q112", v, store)
    }),

    // TPC-H Q21 (waiting suppliers, adapted lateness = shipped >60 days
    // after order): the correlated EXISTS/NOT EXISTS pair de-correlates
    // into two per-order COUNT(DISTINCT supplier) views — "another
    // supplier exists" ⇔ nsupp ≥ 2, "no OTHER late supplier" ⇔ nlate = 1
    // (the row itself is late) — all maintained, deltas on both tables.
    "q113_tpch_q21" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q113 AS
           WITH j AS (
             SELECT o_orderkey, l_suppkey,
                    CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                         THEN 1 ELSE 0 END AS late
             FROM (SELECT o_orderkey, o_orderdate FROM orders
                   WHERE o_orderstatus = 'F') o
             JOIN (SELECT l_orderkey AS o_orderkey, l_suppkey, l_shipdate
                   FROM lineitem) l
               USING (o_orderkey)
           ), ns AS (
             SELECT o_orderkey, COUNT(DISTINCT l_suppkey) AS nsupp
             FROM j GROUP BY o_orderkey
           ), nl AS (
             SELECT o_orderkey, COUNT(DISTINCT l_suppkey) AS nlate
             FROM j WHERE late = 1 GROUP BY o_orderkey
           )
           SELECT s_name, COUNT(*) AS numwait
           FROM j
           JOIN ns USING (o_orderkey)
           JOIN nl USING (o_orderkey)
           JOIN (SELECT s_suppkey AS l_suppkey, s_name FROM supplier) s
             USING (l_suppkey)
           WHERE late = 1 AND nsupp >= 2 AND nlate = 1
           GROUP BY s_name""")
      Ivm.create("q113", v, base(s, dir), store)
      Ivm.refreshState("q113", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q113", v, store)
    }),

    // TPC-H Q22 (global sales opportunity, adapted country code =
    // c_nationkey % 5): the above-average test is cross-multiplied into
    // exact decimal form via TWO scalar subviews (sum and count), and the
    // "no orders" test is the maintained NOT IN anti keyset — customers
    // enter the view when their last order is deleted.
    "q114_tpch_q22" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q114 AS
           WITH pos AS (
             SELECT CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer
             WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (1, 2, 3))
           SELECT code, COUNT(*) AS numcust,
                  SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS totacctbal
           FROM (
             SELECT code, c_acctbal FROM (
               SELECT c_custkey, c_acctbal, code FROM (
                 SELECT c_custkey, c_acctbal,
                        CAST(c_nationkey % 5 AS BIGINT) AS code
                 FROM customer)
               WHERE code IN (1, 2, 3)
                 AND CAST(c_acctbal AS DECIMAL(12,2)) *
                       (SELECT COUNT(*) FROM pos) >
                     (SELECT SUM(bal) FROM pos))
             WHERE c_custkey NOT IN (
               SELECT o_custkey AS c_custkey FROM orders
               WHERE o_totalprice > 430000.0))
           GROUP BY code""")
      Ivm.create("q114", v, base(s, dir), store)
      Ivm.refreshState("q114", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q114", v, store)
        .select(col("code"), col("numcust"),
          col("totacctbal").cast("double").as("totacctbal"))
    }),

    // TPC-H Q17 in its NATIVE correlated form: the 0.2*avg-per-part scalar
    // subquery DECORRELATES automatically into a per-key aggregate view
    // LEFT-joined on the correlation key — same result as the manual
    // join-back (q111), but the user writes the textbook SQL. avg over
    // integer-valued doubles is exact, so the comparison is engine-stable.
    "q116_tpch_q17_native" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q116 AS
           SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS total_price,
                  COUNT(*) AS n
           FROM (SELECT p_partkey FROM part WHERE p_brand = 'Brand#12') p
           JOIN (SELECT l_partkey AS p_partkey, l_quantity, l_extendedprice
                 FROM lineitem) l
             USING (p_partkey)
           WHERE l_quantity < (
             SELECT 0.2 * AVG(l2.l_quantity) FROM
               (SELECT l_partkey AS p_partkey, l_quantity AS l_quantity
                FROM lineitem) l2
             WHERE l2.p_partkey = p_partkey)""")
      Ivm.create("q116", v, base(s, dir), store)
      Ivm.refreshState("q116", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q116", v, store).select(
        col("total_price").cast("double").as("total_price"), col("n"))
    }),

    // Maintained APPROX_PERCENTILE: per-group KLL sketch state (O(k) per
    // group at any scale — the 100 TB answer to exact PERCENTILE's value
    // multiset). KLL compaction is randomized, so the gate is the sketch's
    // rank-error contract, not a value hash: the estimate must land
    // between the exact 40th and 60th percentiles (k=200 ⇒ ~1.65% rank
    // error — a 10× margin), checked against exact PERCENTILE state
    // maintained in the SAME view.
    "q117_ivm_approx_percentile" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q117 AS
           SELECT event_type,
                  APPROX_PERCENTILE(value, 0.5) AS ap50,
                  PERCENTILE(value, 0.4) AS lo,
                  PERCENTILE(value, 0.6) AS hi,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""")
      Ivm.create("q117", v, base(s, dir), store)
      val insertOnly: String => Option[DataFrame] =
        t => deltas(s, dir)(t).map(_.where(col(M))) // sketches: inserts only
      Ivm.refreshState("q117", v, base(s, dir), insertOnly, store)
      Ivm.read("q117", v, store).select(col("event_type"),
        ((col("ap50").isNull && col("lo").isNull) ||
          (col("ap50") >= col("lo") && col("ap50") <= col("hi")))
          .as("est_ok"),
        col("n"))
    }),

    // Maintained APPROX_TOP_K: per-group frequent-items sketch state
    // (heavy hitters — the third maintained sketch next to HLL distinct
    // counts and KLL quantiles). The gate is the sketch's
    // NO_FALSE_NEGATIVES contract: the EXACT most-frequent item (computed
    // Spark-side from the applied input, ties broken count DESC, item
    // ASC — the sketch's own order) must appear in the maintained top-5
    // candidate list; the oracle pins the group set and counts.
    "q118_ivm_approx_topk" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q118 AS
           SELECT event_type,
                  APPROX_TOP_K(CAST(user_id % 50 AS STRING), 5) AS hh,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""")
      Ivm.create("q118", v, base(s, dir), store)
      val insertOnly: String => Option[DataFrame] =
        t => deltas(s, dir)(t).map(_.where(col(M))) // sketches: inserts only
      Ivm.refreshState("q118", v, base(s, dir), insertOnly, store)
      val applied = tbl(s, dir, "events")
        .select(col("event_type"), col("user_id"))
        .unionByName(deltas(s, dir)("events").get.where(col(M))
          .select(col("event_type"), col("user_id")))
      val counts = applied
        .groupBy(col("event_type"),
          (col("user_id") % 50).cast("string").as("item"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy(col("cnt").desc, col("item").asc)
      val top1 = counts.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).select(col("event_type"), col("item"))
      Ivm.read("q118", v, store).join(top1, Seq("event_type"))
        .select(col("event_type"),
          array_contains(col("hh"), col("item")).as("est_ok"), col("n"))
    }),

    // VIEW CASCADE (the poster's composability goal as an API): hourly
    // per-(event_type, hour) counts maintain from the events delta, and a
    // per-type daily summary maintains from the HOURLY VIEW'S OWN OUTPUT
    // CHANGELOG — O(‖ΔV‖) downstream work, no rescan of the level below.
    // Deletes flow through both levels (upstream group death must retract
    // the hour from the downstream SUM/MAX/COUNT — MAX falls back via the
    // aux multiset). All-BIGINT outputs keep the compare exact.
    "q119_ivm_cascade" -> ((s, dir) => {
      val store = new MemStore
      val up = graft.ivm.Aggregate(
        graft.ivm.Project(graft.ivm.Scan("events"), Seq(col("event_type"),
          org.apache.spark.sql.functions.expr("ts DIV 3600000000000").as("hr"))),
        Seq("event_type", "hr"), Seq(graft.ivm.AggSpec.CountStar("hits")))
      val down = graft.ivm.Aggregate(graft.ivm.Scan("up119"),
        Seq("event_type"),
        Seq(graft.ivm.AggSpec.Sum(col("hits"), "total"),
          graft.ivm.AggSpec.Max(col("hits"), "peak"),
          graft.ivm.AggSpec.CountStar("hours")))
      val c = new graft.ivm.Cascade(
        Seq("up119" -> up, "down119" -> down), base(s, dir), store)
      c.create()
      c.refresh(deltas(s, dir))
      c.read("down119")
    }),

    // CDC UPDATES INTO A SKETCH VIEW: a Debezium-shaped log whose `u` ops
    // expand into retraction ⊎ assertion (Cdc.toDeltas) maintains an
    // APPROX_COUNT_DISTINCT view — the retraction-hit groups' HLL sketches
    // rebuild from the post-batch child (O(touched groups), not O(state)),
    // so the composition round 3 flagged as fatal is now first-class. The
    // oracle checks the exact counts AND gates the estimate within 5%.
    "q120_ivm_cdc_sketch" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q120 AS
           SELECT event_type,
                  APPROX_COUNT_DISTINCT(user_id) AS approx_users,
                  COUNT(DISTINCT user_id) AS exact_users,
                  COUNT(*) AS n
           FROM events GROUP BY event_type""")
      Ivm.create("q120", v, base(s, dir), store)
      // Debezium envelope derived deterministically from the base parquet:
      // even %37 rows are updates (user_id += 1e6), odd %37 rows deletes,
      // %59 rows inserts of a fresh user (full row images, as Debezium
      // emits them).
      val ev = Fixtures.tbl(s, dir, "events") // ts normalized like base()
      def img(uidShift: Long) = struct(col("event_id"), col("ts"),
        (col("user_id") + uidShift).as("user_id"), col("event_type"),
        col("value"), col("props"))
      val nullImg = when(lit(false), img(0)) // typed NULL image
      val upd = ev.where(col("event_id") % 37 === 0 && col("event_id") % 2 === 0)
        .select(lit("u").as("op"), img(0).as("before"), img(1000000L).as("after"))
      val del = ev.where(col("event_id") % 37 === 0 && col("event_id") % 2 =!= 0)
        .select(lit("d").as("op"), img(0).as("before"), nullImg.as("after"))
      val ins = ev.where(col("event_id") % 59 === 0)
        .select(lit("c").as("op"), nullImg.as("before"), img(2000000L).as("after"))
      val delta = graft.sources.Cdc.toDeltas(upd.unionByName(del).unionByName(ins))
      Ivm.refreshState("q120", v, base(s, dir),
        t => if (t == "events") Some(delta) else None, store)
      Ivm.read("q120", v, store).select(col("event_type"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("est_ok"),
        col("exact_users"), col("n"))
    }),

    // STREAMING END-TO-END: the delta batch arrives through Structured
    // Streaming (real file source, one file per micro-batch, durable
    // transactional store + checkpoint) and IvmStream.maintain folds each
    // micro-batch into the view; the final store contents must hash-match
    // the oracle's one-shot batch application. This gates the deployment
    // mode the engine is built for — continuous maintenance — not just
    // its batch twin.
    "q122_ivm_stream_e2e" -> ((s, dir) => {
      val store = new ParquetStore(s,
        java.nio.file.Files.createTempDirectory("q122-store").toString)
      val v = Aggregate(Scan("events"), Seq("event_type"),
        Seq(Sum(col("value").cast("decimal(18,2)"), "sum_value"),
          Sum(col("user_id"), "sum_uid"), CountStar("n")))
      Ivm.create("q122", v, base(s, dir), store)
      val d = Fixtures.deltaEvents(s, dir)
      val feed = java.nio.file.Files.createTempDirectory("q122-in").toString
      (0 until 3).foreach { i => // 3 micro-batches, deterministic split
        d.where(col("event_id") % 3 === i).coalesce(1)
          .write.mode("append").parquet(feed)
      }
      val sq = graft.streaming.IvmStream.maintain("q122", v, "events",
        base(s, dir), store,
        s.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", "1").parquet(feed),
        java.nio.file.Files.createTempDirectory("q122-ck").toString)
      sq.processAllAvailable()
      sq.stop()
      Ivm.read("q122", v, store).select(col("event_type"),
        col("sum_value").cast("double").as("sum_value"),
        col("sum_uid"), col("n"))
    }),

    // MAINTAINED DEDUP: MinHash-LSH candidate pairs as an incrementally
    // maintained two-level cascade under document inserts AND deletes —
    // level 1 maintains the signature multiset (a batch hashes only its
    // own documents), level 2 maintains the pair set from level 1's
    // changelog via band self-joins. At 100 TB this turns per-release
    // full-corpus dedup into per-batch O(‖Δ‖) maintenance; the oracle
    // recomputes the whole pipeline over the post-delta corpus in DuckDB.
    "q123_ivm_dedup_minhash" -> ((s, dir) => {
      val store = new MemStore
      val c = new graft.ivm.Cascade(
        Seq("sig123" -> dedupSigView(s), "pairs123" -> dedupPairsView),
        base(s, dir), store)
      c.create()
      c.refresh(deltas(s, dir))
      c.read("pairs123")
    }),

    // STREAMING MAINTAINED DEDUP: the q123 MinHash cascade driven by a
    // REAL Structured Streaming file source — 3 micro-batches of document
    // churn fold through `Cascade.applyBatch` (both levels + the replay
    // marker commit in one store transaction per batch) on the durable
    // ParquetStore. The final pair set is interleaving-independent, so
    // the q123 batch oracle gates it verbatim — closing the one gap
    // between the streaming plumbing (q122, single view) and the
    // maintained-dedup thesis (q123, batch-driven): the production shape
    // is this, a dedup cascade fed by a stream.
    "q133_ivm_stream_dedup_cascade" -> ((s, dir) => {
      val store = new graft.ivm.ParquetStore(s,
        java.nio.file.Files.createTempDirectory("q133-store").toString)
      val c = new graft.ivm.Cascade(
        Seq("sig123" -> dedupSigView(s), "pairs123" -> dedupPairsView),
        base(s, dir), store)
      c.create()
      val d = Fixtures.deltaDocuments(s, dir)
      val feed = java.nio.file.Files.createTempDirectory("q133-in").toString
      (0 until 3).foreach { i => // 3 micro-batches, deterministic split
        d.where(col("doc_id") % 3 === i).coalesce(1)
          .write.mode("append").parquet(feed)
      }
      val sq = s.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
        .writeStream
        .foreachBatch(c.applyBatch("documents") _)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("q133-ck").toString)
        .start()
      sq.processAllAvailable()
      sq.stop()
      c.read("pairs123")
    }),

    // MAINTAINED EMBEDDING NEAR-DUP: the blocked-cosine pair set of q24
    // as an incrementally maintained view under embedding inserts and
    // deletes — a deleted vector retracts its pairs, a new one joins only
    // its block. Per-batch work is O(‖Δ‖ × block), not O(corpus²).
    "q124_ivm_dedup_embedding" -> ((s, dir) => {
      val store = new MemStore
      val v = embNearDupView(s)
      Ivm.create("q124", v, base(s, dir), store)
      Ivm.refreshState("q124", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q124", v, store)
    }),

    // MAINTAINED DECONTAMINATION: benchmark-overlap detection (q72's
    // per-release job) as an always-current view — corpus/eval churn in
    // one batch updates the contamination pair set incrementally.
    "q125_ivm_decontaminate" -> ((s, dir) => {
      val store = new MemStore
      Ivm.create("q125", decontamView, base(s, dir), store)
      Ivm.refreshState("q125", decontamView, base(s, dir), deltas(s, dir), store)
      Ivm.read("q125", decontamView, store)
    }),

    // MAINTAINED CURATION PIPELINE: q63's sample → score → threshold →
    // dedup → per-language stats as a two-level cascade — the corpus
    // dashboard stays current under churn instead of being recomputed
    // per release. Exercises MIN_BY flowing through a cascade changelog.
    "q126_ivm_curation" -> ((s, dir) => {
      val store = new MemStore
      val c = new graft.ivm.Cascade(
        Seq("kept126" -> curationKeptView, "stats126" -> curationStatsView),
        base(s, dir), store)
      c.create()
      c.refresh(deltas(s, dir))
      c.read("stats126")
    }),

    // MULTI-STREAM END-TO-END: TWO concurrent Structured Streaming
    // queries (orders and lineitem file feeds, 2 micro-batches each)
    // maintain ONE join view on one transactional store — concurrent
    // whole-refresh transactions serialize, per-(view, table) replay
    // markers stay independent, and the per-table delta accumulators
    // make each stream's batches visible to the other's join terms. The
    // final state is interleaving-independent (the delta algebra
    // commutes), so the q73 batch oracle gates it exactly.
    "q127_ivm_multistream_e2e" -> ((s, dir) => {
      val store = new ParquetStore(s,
        java.nio.file.Files.createTempDirectory("q127-store").toString)
      val v = Aggregate(
        Join(
          Project(Scan("orders"), Seq(col("o_orderkey").as("k"),
            col("o_orderpriority"))),
          Project(Scan("lineitem"), Seq(col("l_orderkey").as("k"),
            col("l_quantity"))),
          Seq("k")),
        Seq("o_orderpriority"),
        Seq(Sum(col("l_quantity"), "sum_qty"), CountStar("cnt")))
      Ivm.create("q127", v, base(s, dir), store,
        deltaTables = Set("orders", "lineitem"))
      def feed(d: DataFrame, splitKey: Column): DataFrame = {
        val in = java.nio.file.Files.createTempDirectory("q127-in").toString
        (0 until 2).foreach { i =>
          d.where(splitKey % 2 === i).coalesce(1)
            .write.mode("append").parquet(in)
        }
        s.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
      }
      val qs = graft.streaming.IvmStream.maintainMulti("q127", v,
        base(s, dir), store,
        Map(
          "orders" -> feed(deltaOrders(s, dir), col("o_orderkey") % 7),
          "lineitem" -> feed(deltaLineitem(s, dir), col("l_partkey"))),
        java.nio.file.Files.createTempDirectory("q127-ck").toString)
      qs.values.foreach(_.processAllAvailable())
      qs.values.foreach(_.stop())
      Ivm.read("q127", v, store)
    }),

    // TIME TRAVEL: create on the versioned store, commit a delta batch,
    // then read the PRE-DELTA snapshot via asOf — the oracle is the
    // delta-free base query, proving retained manifests serve history
    // exactly (the snapshot-isolation mechanics double as time travel).
    "q115_time_travel" -> ((s, dir) => {
      val store = new ParquetStore(s,
        java.nio.file.Files.createTempDirectory("q115-store").toString,
        keepVersions = 8) // retention window = how far back asOf can reach
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q115 AS
           SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
                  COUNT(*) AS cnt
           FROM lineitem GROUP BY l_returnflag, l_linestatus""")
      Ivm.create("q115", v, base(s, dir), store)
      val v0 = store.currentVersion
      Ivm.refreshState("q115", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q115", v, store.asOf(v0)) // the view as of BEFORE the batch
    }),

    // MULTI-COLUMN IN: the composite (l_orderkey, l_suppkey) key set is
    // one maintained DISTINCT view; the semi join reacts when a pair's
    // last qualifying row dies or first arrives.
    "q104_ivm_multi_in" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q104 AS
           SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty
           FROM lineitem
           WHERE (l_orderkey, l_suppkey) IN (
             SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 49)
           GROUP BY l_returnflag""")
      Ivm.create("q104", v, base(s, dir), store)
      Ivm.refreshState("q104", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q104", v, store)
    }),

    // PLAIN UNION (set semantics): DISTINCT over the stateless bag union,
    // deltas on BOTH sides in one batch — membership holds while either
    // side still has a copy.
    "q105_ivm_union_distinct" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q105 AS
           SELECT l_orderkey AS k FROM lineitem WHERE l_quantity > 47
           UNION
           SELECT o_orderkey AS k FROM orders WHERE o_totalprice > 400000""")
      Ivm.create("q105", v, base(s, dir), store)
      Ivm.refreshState("q105", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q105", v, store)
    }),

    // Sequence packing (training-example assembly): deterministic offset
    // packing of documents into 256-token context windows across 16
    // independent streams — no global sort, no payload shuffle; see
    // ops/Packing.scala for the 100 TB story.
    "q100_pack" -> ((s, dir) => {
      val docs = tbl(s, dir, "documents")
      ops.Packing.packAssignments(docs, col("doc_id"),
        size(split(col("text"), " ")), capacity = 256, buckets = 16)
    }),

    "q86_ivm_share_of_total" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q86 AS
           SELECT l_orderkey, l_linenumber,
                  l_quantity / (SELECT SUM(l_quantity) FROM lineitem)
                    AS q_share
           FROM lineitem""")
      Ivm.create("q86", v, base(s, dir), store)
      Ivm.refreshState("q86", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q86", v, store)
    }),

    // MAINTAINED LISTAGG (deterministic ascending-value order) — the
    // ordered concatenation rebuilds from the aux value-multiset on each
    // touched group: O(group's values), never a base rescan. The delta
    // inserts DUPLICATE line numbers (multiplicity 2) and deletes others,
    // so the string must gain/lose exactly one occurrence.
    "q84_ivm_listagg_apply" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q84 AS
           SELECT l_orderkey, LISTAGG(l_linenumber, ',') AS lns,
                  COUNT(*) AS n
           FROM lineitem GROUP BY l_orderkey""")
      Ivm.create("q84", v, base(s, dir), store)
      Ivm.refreshState("q84", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q84", v, store)
    }),

    // SCALAR SUBQUERY in WHERE, maintained: the threshold is a 1-row
    // global-aggregate subview cross-joined against the child (empty-key
    // Join); when the average moves, rows whose qualification flips enter/
    // leave the multiset — unchanged rows cancel between the old-value
    // retraction and new-value assertion. Deltas hit BOTH the child and
    // the subquery (same table), exercising the self-join delta terms.
    "q83_ivm_scalar_subquery" -> ((s, dir) => {
      val store = new MemStore
      val (_, v) = graft.ivm.SqlFrontend.createImmv(s,
        """CREATE IMMV q83 AS
           SELECT l_orderkey, l_linenumber, l_quantity
           FROM lineitem
           WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem)""")
      Ivm.create("q83", v, base(s, dir), store)
      Ivm.refreshState("q83", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q83", v, store)
    }),

    // Deterministic stratified sampling: per-stratum keep rates derived
    // from an md5 hash of the row id (never rand() — retry/speculation
    // stable, oracle-reproducible); the sample is a pure zero-shuffle
    // filter. Aggregated per stratum so the gate checks exact membership.
    "q55_stratified_sample" -> ((s, dir) => {
      val rate = when(col("event_type") === "click", 60)
        .when(col("event_type") === "view", 5)
        .otherwise(25)
      ops.Sampling.stratified(tbl(s, dir, "events"), col("event_id"), rate)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
    }),

    // SHARED AUX MULTISET in one view: MIN+MAX+COUNT(DISTINCT)+SUM(DISTINCT)
    // of ONE column maintain a single (group, value) count state — the four
    // read-outs differ (fold / fold / born−died / born−died), but the
    // multiset is stored and adjusted once. Gates the delta-bound refresh
    // formulas composing inside one joined state update.
    "q128_ivm_shared_aux_apply" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
        Seq(Min(col("l_quantity"), "min_qty"), Max(col("l_quantity"), "max_qty"),
          CountDistinct(col("l_quantity"), "nd_qty"),
          SumDistinct(col("l_quantity"), "sd_qty"), CountStar("cnt")))
      Ivm.create("q128", v, base(s, dir), store)
      Ivm.refreshState("q128", v, base(s, dir), deltas(s, dir), store)
      Ivm.read("q128", v, store)
    }),

    // INSERT-ONLY extremum maintenance: the view declares its feed
    // append-only, so MIN/MAX/MAX_BY keep NO auxiliary multiset — state is
    // O(groups), each batch folds its inserted extrema into the stored
    // value (a delete would fail loudly; the feed here is the insert half
    // of the standard delta). The O(rows)-state-free mode an append-only
    // training-data pipeline runs at 100 TB.
    "q129_ivm_insert_only_minmax" -> ((s, dir) => {
      val store = new MemStore
      val v = Aggregate(Scan("lineitem"), Seq("l_returnflag"),
        Seq(Min(col("l_quantity"), "min_qty"), Max(col("l_quantity"), "max_qty"),
          MaxBy(col("l_quantity"), col("l_orderkey"), "biggest_order"),
          CountStar("cnt")))
      Ivm.create("q129", v, base(s, dir), store, deltaTables = null,
        insertOnly = true)
      val insertsOnly: String => Option[org.apache.spark.sql.DataFrame] = {
        case "lineitem" =>
          Some(deltaLineitem(s, dir).where(col(graft.ivm.IvmCore.MULT)))
        case _ => None
      }
      Ivm.refreshState("q129", v, base(s, dir), insertsOnly, store)
      Ivm.read("q129", v, store)
    }),
  )

  // ------------------------------------------------------------- oracles

  /** Deterministic derived deltas, as SQL fragments (Fixtures mirrors). */
  private val DL =
    s"SELECT *, (l_linenumber % 2 = 0) AS $M FROM lineitem WHERE l_orderkey % 97 = 0"
  private val DO_ =
    s"SELECT *, (o_orderkey % 2 = 0) AS $M FROM orders WHERE o_orderkey % 53 = 0"
  private val DC =
    s"SELECT *, (c_custkey % 2 = 0) AS $M FROM customer WHERE c_custkey % 29 = 0"
  private val DE =
    s"SELECT *, (event_id % 2 = 0) AS $M FROM events WHERE event_id % 37 = 0"
  private val DD =
    s"SELECT *, (doc_id % 2 = 0) AS $M FROM documents WHERE doc_id % 13 = 0"

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

    "q11_ivm_minmax_apply" ->
      s"""WITH applied AS (
            SELECT l_returnflag, l_quantity, l_shipdate, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, l_shipdate, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity, l_shipdate,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, MIN(l_quantity) AS min_qty,
                 MAX(l_quantity) AS max_qty, MIN(l_shipdate) AS min_ship,
                 CAST(SUM(c) AS BIGINT) AS cnt
          FROM applied GROUP BY l_returnflag""",

    "q16_ivm_avg_apply" ->
      s"""SELECT l_returnflag, l_linestatus,
          SUM(l_quantity * w) / SUM(w) AS avg_qty,
          CAST(SUM(w) AS BIGINT) AS cnt
          FROM (
            SELECT l_returnflag, l_linestatus, l_quantity, 1 AS w FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
          ) GROUP BY l_returnflag, l_linestatus HAVING SUM(w) > 0""",

    "q15_ivm_count_distinct_apply" ->
      s"""WITH a AS (
            SELECT l_returnflag, l_quantity, l_suppkey, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, l_suppkey, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity, l_suppkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT l_returnflag,
            CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
            CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
            CAST(SUM(c) AS BIGINT) AS cnt
          FROM a GROUP BY l_returnflag""",

    "q14_ivm_q13_real_apply" ->
      s"""WITH o2 AS (
            -- multiset apply: m = post-delta multiplicity per order row
            -- (a derived "insert" duplicates an existing base row -> m = 2)
            SELECT o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY o_orderkey, o_custkey HAVING SUM(w) > 0
          ), c1 AS (
            SELECT c_custkey, CAST(COALESCE(SUM(m), 0) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN o2 ON c_custkey = o_custkey
            GROUP BY c_custkey
          )
          SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
          FROM c1 GROUP BY c_count""",

    // Shared-state maintenance of the same Q13 view — identical oracle.
    "q67_ivm_shared_apply" ->
      s"""WITH o2 AS (
            SELECT o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY o_orderkey, o_custkey HAVING SUM(w) > 0
          ), c1 AS (
            SELECT c_custkey, CAST(COALESCE(SUM(m), 0) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN o2 ON c_custkey = o_custkey
            GROUP BY c_custkey
          )
          SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
          FROM c1 GROUP BY c_count""",

    "q46_ivm_sum_distinct_apply" ->
      s"""WITH a AS (
            SELECT l_returnflag, l_quantity, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, SUM(l_quantity) AS sdq,
                 CAST(COUNT(*) AS BIGINT) AS cdq, CAST(SUM(c) AS BIGINT) AS n
          FROM a GROUP BY l_returnflag""",

    // Mirrors the engine's moment formula EXACTLY (same operand tree over
    // exact double sums of integer-valued quantities → bit-identical IEEE
    // results), so no rounding is needed for the hash compare.
    "q47_ivm_var_apply" ->
      s"""WITH m AS (
            SELECT l_returnflag,
                   SUM(l_quantity * w) AS s1,
                   SUM(l_quantity * l_quantity * w) AS s2,
                   CAST(SUM(CASE WHEN l_quantity IS NOT NULL THEN w ELSE 0 END)
                        AS DOUBLE) AS nn,
                   CAST(SUM(w) AS BIGINT) AS cnt
            FROM (
              SELECT l_returnflag, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY l_returnflag HAVING SUM(w) > 0
          )
          SELECT l_returnflag,
            CASE WHEN nn > 1
                 THEN GREATEST((s2 - s1 * s1 / nn) / (nn - 1), 0) END AS v_qty,
            CASE WHEN nn > 1
                 THEN SQRT(GREATEST((s2 - s1 * s1 / nn) / (nn - 1), 0)) END AS sd_qty,
            CASE WHEN nn > 0
                 THEN GREATEST((s2 - s1 * s1 / nn) / nn, 0) END AS vp_qty,
            cnt
          FROM m""",

    "q48_immv_cte" ->
      s"""WITH o2 AS (
            SELECT o_custkey, o_totalprice, CAST(SUM(w) AS INTEGER) AS m FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY o_orderkey, o_custkey, o_totalprice HAVING SUM(w) > 0
          ), percust AS (
            SELECT o_custkey AS k, CAST(SUM(m) AS BIGINT) AS n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2)) * m) AS amt
            FROM o2 WHERE o_totalprice > 100000 GROUP BY o_custkey
          )
          SELECT n, CAST(COUNT(*) AS BIGINT) AS dist,
                 CAST(SUM(amt) AS DOUBLE) AS total
          FROM percust GROUP BY n""",

    "q68_immv_agg_filter" ->
      s"""SELECT l_returnflag,
            SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END * w) AS qty_f,
            CAST(SUM(CASE WHEN l_quantity > 25 THEN w ELSE 0 END) AS BIGINT)
              AS cnt_big,
            SUM(CASE WHEN l_tax > 0.03 THEN l_quantity END * w)
              / SUM(CASE WHEN l_tax > 0.03 THEN w END) AS avg_taxed,
            CAST(SUM(w) AS BIGINT) AS cnt
          FROM (
            SELECT l_returnflag, l_linestatus, l_quantity, l_tax, 1 AS w
            FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_linestatus, l_quantity, l_tax,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
          ) GROUP BY l_returnflag HAVING SUM(w) > 0""",

    "q69_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
            SUM(l_quantity * w) AS sum_qty,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * w) AS DOUBLE)
              AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                     (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     * w) AS DOUBLE) AS sum_disc_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                     (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) *
                     (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))
                     * w) AS DOUBLE) AS sum_charge,
            SUM(l_quantity * w) / SUM(w) AS avg_qty,
            CAST(SUM(w) AS BIGINT) AS count_order
          FROM (
            SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
                   l_discount, l_tax, 1 AS w FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            UNION ALL
            SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
                   l_discount, l_tax, CASE WHEN $M THEN 1 ELSE -1 END
            FROM ($DL) WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          ) GROUP BY l_returnflag, l_linestatus HAVING SUM(w) > 0""",

    "q70_tpch_q3" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority, 1 AS w
              FROM orders WHERE o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
              UNION ALL
              SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority,
                     CASE WHEN $M THEN 1 ELSE -1 END
              FROM ($DO_) WHERE o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
            ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_extendedprice, l_discount,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_extendedprice, l_discount, 1 AS w
              FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
              UNION ALL
              SELECT l_orderkey, l_extendedprice, l_discount,
                     CASE WHEN $M THEN 1 ELSE -1 END
              FROM ($DL) WHERE l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT o2.o_orderkey,
            CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) *
                     (CAST(1 AS DECIMAL(3,2)) - CAST(l2.l_discount AS DECIMAL(4,2)))
                     * o2.m * l2.m) AS DOUBLE) AS revenue,
            o2.o_orderdate, o2.o_orderpriority
          FROM customer
          JOIN o2 ON c_custkey = o2.o_custkey
          JOIN l2 ON l2.l_orderkey = o2.o_orderkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY 1, 3, 4""",

    "q71_tpch_q6" ->
      s"""SELECT
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                     CAST(l_discount AS DECIMAL(4,2)) * w) AS DOUBLE) AS revenue,
            CAST(SUM(w) AS BIGINT) AS cnt
          FROM (
            SELECT l_extendedprice, l_discount, 1 AS w FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
            UNION ALL
            SELECT l_extendedprice, l_discount, CASE WHEN $M THEN 1 ELSE -1 END
            FROM ($DL)
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
          )""",

    "q73_ivm_crossbatch" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_orderpriority, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_orderpriority, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_orderpriority,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_quantity, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT o_orderpriority, SUM(l_quantity * o2.m * l2.m) AS sum_qty,
                 CAST(SUM(o2.m * l2.m) AS BIGINT) AS cnt
          FROM o2 JOIN l2 ON o_orderkey = l_orderkey
          GROUP BY 1""",

    "q49_ivm_window_apply" ->
      s"""WITH ap AS (
            SELECT "hour", event_type, user_id, value, SUM(w) AS c FROM (
              SELECT date_trunc('hour', ts) AS "hour", event_type, user_id,
                     value, 1 AS w FROM events
              UNION ALL
              SELECT date_trunc('hour', ts), event_type, user_id, value,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DE)
            ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) > 0
          )
          SELECT "hour", event_type, CAST(SUM(c) AS BIGINT) AS n_events,
                 CAST(SUM(CAST(value AS DECIMAL(18,2)) * c) AS DOUBLE) AS sum_value,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
          FROM ap GROUP BY 1, 2""",

    // The view keeps odd order keys only, so the derived delta hits it
    // with deletes (odd keys in the delta carry mult=false); multiplicity
    // stays 0/1 and the top-k is read straight off the applied multiset.
    "q54_ivm_topk_apply" ->
      s"""WITH ap AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w
              FROM orders WHERE o_orderkey % 2 = 1
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END
              FROM ($DO_) WHERE o_orderkey % 2 = 1
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT o_orderkey, o_custkey, o_totalprice FROM ap
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q78_immv_topk" ->
      s"""WITH ap AS (
            SELECT o_orderkey, o_custkey, o_totalprice FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w
              FROM orders WHERE o_orderkey % 2 = 1
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END
              FROM ($DO_) WHERE o_orderkey % 2 = 1
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT o_orderkey, o_custkey, o_totalprice FROM ap
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q65_ivm_dedup_apply" ->
      s"""WITH ap AS (
            SELECT doc_id, text, SUM(w) AS c FROM (
              SELECT doc_id, text, 1 AS w FROM documents
              UNION ALL
              SELECT doc_id, text,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DD)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
                 CAST(SUM(c) AS BIGINT) AS n_copies
          FROM ap GROUP BY md5(text)""",

    "q66_ivm_corpus_stats_apply" ->
      s"""WITH ap AS (
            SELECT doc_id, text, SUM(w) AS c FROM (
              SELECT doc_id, text, 1 AS w FROM documents
              UNION ALL
              SELECT doc_id, text,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DD)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), a AS (${textAnalyzeSql("ap")})
          SELECT pred_lang,
                 CAST(SUM(n_tokens * c) AS BIGINT) AS n_tokens,
                 CAST(SUM(c) AS BIGINT) AS n_docs
          FROM a JOIN ap USING (doc_id)
          GROUP BY pred_lang""",

    "q63_curation_pipeline" ->
      s"""WITH sampled AS (
            SELECT * FROM documents
            WHERE (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 80
          ), scored AS (
            SELECT * FROM (${textAnalyzeSql("sampled")}) WHERE quality > 0.5
          ), keep AS (
            SELECT MIN(s.doc_id) AS doc_id FROM sampled s
            JOIN scored USING (doc_id) GROUP BY md5(s.text)
          )
          SELECT pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                 round(AVG(quality), 6) AS avg_quality
          FROM scored JOIN keep USING (doc_id)
          GROUP BY pred_lang""",

    "q61_ivm_exists" ->
      s"""WITH ap_o AS (
            SELECT o_custkey, o_totalprice FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer
          WHERE EXISTS (SELECT 1 FROM ap_o
                        WHERE ap_o.o_custkey = customer.c_custkey
                          AND o_totalprice > 150000)
          GROUP BY c_mktsegment""",

    "q62_ivm_not_exists" ->
      s"""WITH ap_o AS (
            SELECT o_custkey, o_totalprice FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n FROM customer
          WHERE NOT EXISTS (SELECT 1 FROM ap_o
                            WHERE ap_o.o_custkey = customer.c_custkey
                              AND o_totalprice > 150000)
          GROUP BY c_mktsegment""",

    "q60_ivm_cube_apply" ->
      s"""WITH ap AS (
            SELECT o_orderstatus, o_orderpriority, o_totalprice, SUM(w) AS c FROM (
              SELECT o_orderstatus, o_orderpriority, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderstatus, o_orderpriority, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT o_orderstatus, o_orderpriority,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * c) AS DOUBLE) AS sum_price,
                 CAST(SUM(c) AS BIGINT) AS n
          FROM ap GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "q59_ivm_rollup_apply" ->
      s"""WITH ap AS (
            SELECT l_returnflag, l_linestatus, l_quantity, SUM(w) AS c FROM (
              SELECT l_returnflag, l_linestatus, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_linestatus, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, l_linestatus, SUM(l_quantity * c) AS sq,
                 CAST(SUM(c) AS BIGINT) AS n
          FROM ap GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q76_immv_rollup" ->
      s"""WITH ap AS (
            SELECT l_returnflag, l_linestatus, l_quantity, SUM(w) AS c FROM (
              SELECT l_returnflag, l_linestatus, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_linestatus, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, l_linestatus, SUM(l_quantity * c) AS sq,
                 CAST(SUM(c) AS BIGINT) AS n
          FROM ap GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q77_immv_grouping_sets" ->
      s"""WITH ap AS (
            SELECT o_orderstatus, o_orderpriority, o_totalprice, SUM(w) AS c FROM (
              SELECT o_orderstatus, o_orderpriority, o_totalprice, 1 AS w
              FROM orders
              UNION ALL
              SELECT o_orderstatus, o_orderpriority, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT o_orderstatus, o_orderpriority,
                 CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * c) AS DOUBLE)
                   AS sp,
                 CAST(SUM(c) AS BIGINT) AS n
          FROM ap GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                          (o_orderpriority), ())""",

    "q58_ivm_not_in" ->
      s"""WITH ap_l AS (
            SELECT l_returnflag, l_quantity, l_orderkey, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, l_orderkey, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity, l_orderkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), ap_o AS (
            SELECT o_orderkey, o_totalprice FROM (
              SELECT o_orderkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, CAST(SUM(c) AS BIGINT) AS n,
                 SUM(l_quantity * c) AS sq
          FROM ap_l
          WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM ap_o WHERE o_totalprice > 150000)
          GROUP BY l_returnflag""",

    // Deterministic-ties mirror: first element of the list ordered by
    // (value, arg) — DuckDB's arg_min/arg_max leave ties unspecified.
    "q56_ivm_argminmax_apply" ->
      s"""WITH a AS (
            SELECT l_returnflag, l_quantity, l_orderkey, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, l_orderkey, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity, l_orderkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT l_returnflag,
            (list(l_orderkey ORDER BY l_quantity ASC, l_orderkey ASC))[1]
              AS cheapest_order,
            (list(l_orderkey ORDER BY l_quantity DESC, l_orderkey DESC))[1]
              AS biggest_order,
            CAST(SUM(c) AS BIGINT) AS cnt
          FROM a GROUP BY l_returnflag""",

    "q57_percentiles" ->
      """SELECT event_type,
         round(quantile_cont(value, 0.5), 6) AS p50,
         round(quantile_cont(value, 0.9), 6) AS p90,
         round(quantile_cont(value, 0.99), 6) AS p99,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY event_type""",

    "q79_ivm_percentile_apply" ->
      s"""WITH ap AS (
            SELECT event_type, value, SUM(w) AS c FROM (
              SELECT event_type, value, 1 AS w FROM events
              UNION ALL
              SELECT event_type, value, CASE WHEN $M THEN 1 ELSE -1 END
              FROM ($DE)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), expanded AS (
            SELECT event_type, value FROM (
              SELECT event_type, value,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM ap)
          )
          SELECT event_type,
                 round(quantile_cont(value, 0.5), 6) AS p50,
                 round(quantile_cont(value, 0.9), 6) AS p90,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM expanded GROUP BY event_type""",

    "q81_ivm_mode_apply" ->
      s"""WITH ap AS (
            SELECT event_type, value, SUM(w) AS c FROM (
              SELECT event_type, value, 1 AS w FROM events
              UNION ALL
              SELECT event_type, value, CASE WHEN $M THEN 1 ELSE -1 END
              FROM ($DE)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), ranked AS (
            SELECT event_type, value, CAST(c AS BIGINT) AS cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY c DESC, value ASC) AS rn
            FROM ap)
          SELECT event_type, value AS mode_value, cnt
          FROM ranked WHERE rn = 1""",

    "q82_ivm_corr_apply" ->
      s"""WITH m AS (
            SELECT l_returnflag,
                   CAST(SUM(l_quantity * w) AS DOUBLE) AS sx,
                   CAST(SUM(l_linenumber * w) AS DOUBLE) AS sy,
                   CAST(SUM(l_quantity * l_linenumber * w) AS DOUBLE) AS sxy,
                   CAST(SUM(l_quantity * l_quantity * w) AS DOUBLE) AS sxx,
                   CAST(SUM(l_linenumber * l_linenumber * w) AS DOUBLE) AS syy,
                   CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                                  AND l_linenumber IS NOT NULL
                                 THEN w ELSE 0 END) AS DOUBLE) AS nn,
                   CAST(SUM(w) AS BIGINT) AS cnt
            FROM (
              SELECT l_returnflag, l_quantity, l_linenumber, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity, l_linenumber,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY l_returnflag HAVING SUM(w) > 0
          )
          SELECT l_returnflag,
            CASE WHEN nn > 0 THEN (sxy - sx * sy / nn) / nn END AS cov_p,
            CASE WHEN nn > 1 THEN (sxy - sx * sy / nn) / (nn - 1) END AS cov_s,
            CASE WHEN nn > 0 AND GREATEST(sxx - sx * sx / nn, 0) > 0
                           AND GREATEST(syy - sy * sy / nn, 0) > 0
                 THEN (sxy - sx * sy / nn) /
                      SQRT(GREATEST(sxx - sx * sx / nn, 0) *
                           GREATEST(syy - sy * sy / nn, 0)) END AS r,
            cnt
          FROM m""",

    "q85_ivm_range_join" ->
      s"""WITH co AS (
            SELECT o_orderkey, o_orderdate, SUM(w) AS c FROM (
              SELECT o_orderkey, o_orderdate, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_orderdate,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), eo AS (
            SELECT o_orderkey, o_orderdate FROM (
              SELECT o_orderkey, o_orderdate,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM co)
          ), cl AS (
            SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
                   SUM(w) AS c FROM (
              SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
                     1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) > 0
          ), el AS (
            SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM (
              SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM cl)
          )
          SELECT eo.o_orderkey AS k, el.l_linenumber, el.l_quantity
          FROM eo JOIN el ON eo.o_orderkey = el.l_orderkey
            AND el.l_shipdate >= eo.o_orderdate
            AND el.l_shipdate < eo.o_orderdate + INTERVAL 30 DAY""",

    "q92_ivm_median_apply" ->
      s"""WITH cl AS (
            SELECT event_type, value, SUM(w) AS c FROM (
              SELECT event_type, value, 1 AS w FROM events
              UNION ALL
              SELECT event_type, value,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DE)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), el AS (
            SELECT event_type, value FROM (
              SELECT event_type, value,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM cl)
          )
          SELECT event_type, ROUND(MEDIAN(value), 6) AS med,
                 ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM el GROUP BY 1""",

    // ---- TPC-H pack oracles: each applies the same delta mix with signed
    // weights, keeps per-row multiplicities m, and multiplies them across
    // join edges (Z-set semantics in plain SQL).

    "q93_tpch_q4" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_orderpriority, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_orderpriority, 1 AS w FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              UNION ALL
              SELECT o_orderkey, o_orderpriority,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), lk AS (
            SELECT DISTINCT o_orderkey FROM (
              SELECT l_orderkey AS o_orderkey, l_quantity, SUM(w) AS c FROM (
                SELECT l_orderkey, l_quantity, 1 AS w FROM lineitem
                WHERE l_quantity > 45
                UNION ALL
                SELECT l_orderkey, l_quantity,
                       CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
                WHERE l_quantity > 45
              ) GROUP BY 1, 2 HAVING SUM(w) > 0)
          )
          SELECT o_orderpriority, CAST(SUM(m) AS BIGINT) AS order_count
          FROM o2 JOIN lk USING (o_orderkey)
          GROUP BY 1""",

    "q94_tpch_q5" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, 1 AS w FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              UNION ALL
              SELECT o_orderkey, o_custkey,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) > 0
          )
          SELECT n_name,
                 CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(3,2)) -
                           CAST(l2.l_discount AS DECIMAL(4,2)))
                          * o2.m * l2.m) AS DOUBLE) AS revenue
          FROM customer c
          JOIN o2 ON o2.o_custkey = c.c_custkey
          JOIN l2 ON l2.l_orderkey = o2.o_orderkey
          JOIN supplier s ON s.s_suppkey = l2.l_suppkey
                         AND s.s_nationkey = c.c_nationkey
          JOIN nation n ON n.n_nationkey = s.s_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey
          WHERE r.r_name = 'ASIA'
          GROUP BY 1""",

    "q95_tpch_q10" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, 1 AS w FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
              UNION ALL
              SELECT o_orderkey, o_custkey,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_extendedprice, l_discount,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_extendedprice, l_discount, 1 AS w
              FROM lineitem WHERE l_returnflag = 'R'
              UNION ALL
              SELECT l_orderkey, l_extendedprice, l_discount,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
              WHERE l_returnflag = 'R'
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT c_custkey, c_name, c_acctbal, n_name,
                 CAST(revenue AS DOUBLE) AS revenue
          FROM (
            SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
                   SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) *
                       (CAST(1 AS DECIMAL(3,2)) -
                        CAST(l2.l_discount AS DECIMAL(4,2)))
                       * o2.m * l2.m) AS revenue
            FROM customer c
            JOIN o2 ON o2.o_custkey = c.c_custkey
            JOIN l2 ON l2.l_orderkey = o2.o_orderkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY 1, 2, 3, 4
          ) ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q96_tpch_q12" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_orderpriority, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_orderpriority, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_orderpriority,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_linestatus, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_linestatus, 1 AS w FROM lineitem
              WHERE l_quantity >= 30
              UNION ALL
              SELECT l_orderkey, l_linestatus,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
              WHERE l_quantity >= 30
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT l_linestatus,
                 CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                                 OR o_orderpriority = '2-HIGH'
                               THEN 1 ELSE 0 END * o2.m * l2.m) AS BIGINT)
                   AS high_count,
                 CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                                AND o_orderpriority <> '2-HIGH'
                               THEN 1 ELSE 0 END * o2.m * l2.m) AS BIGINT)
                   AS low_count,
                 CAST(SUM(o2.m * l2.m) AS BIGINT) AS n
          FROM o2 JOIN l2 ON l2.l_orderkey = o2.o_orderkey
          GROUP BY 1""",

    "q97_tpch_q18" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_quantity, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), k AS (
            SELECT l_orderkey FROM (
              SELECT l_orderkey, SUM(l_quantity * m) AS sq
              FROM l2 GROUP BY 1)
            WHERE sq > 270
          )
          SELECT c.c_name, c.c_custkey, o2.o_orderkey, o2.o_totalprice,
                 SUM(l2.l_quantity * o2.m * l2.m) AS sum_qty
          FROM customer c
          JOIN o2 ON o2.o_custkey = c.c_custkey
          JOIN l2 ON l2.l_orderkey = o2.o_orderkey
          WHERE o2.o_orderkey IN (SELECT l_orderkey FROM k)
          GROUP BY 1, 2, 3, 4""",

    "q98_tpch_q19" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_quantity, l_extendedprice, l_discount,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_quantity, l_extendedprice, l_discount, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_partkey, l_quantity, l_extendedprice, l_discount,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) > 0
          )
          SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(3,2)) -
                           CAST(l_discount AS DECIMAL(4,2))) * m) AS DOUBLE)
                   AS revenue,
                 CAST(SUM(m) AS BIGINT) AS n
          FROM part p JOIN l2 ON l2.l_partkey = p.p_partkey
          WHERE (p_brand = 'Brand#11' AND p_size <= 5 AND l_quantity <= 11)
             OR (p_brand = 'Brand#22' AND p_size <= 10
                 AND l_quantity BETWEEN 10 AND 20)
             OR (p_brand = 'Brand#33' AND p_size <= 15 AND l_quantity >= 20)""",

    "q99_tpch_q14" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_extendedprice, l_discount,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_extendedprice, l_discount, 1 AS w
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
              UNION ALL
              SELECT l_partkey, l_extendedprice, l_discount,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
              WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), sums AS (
            SELECT SUM(CASE WHEN p_type = 'PROMO'
                            THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                                 (CAST(1 AS DECIMAL(3,2)) -
                                  CAST(l_discount AS DECIMAL(4,2)))
                            ELSE CAST(0 AS DECIMAL(12,2)) END * m)
                     AS promo_revenue,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                       (CAST(1 AS DECIMAL(3,2)) -
                        CAST(l_discount AS DECIMAL(4,2))) * m) AS total_revenue
            FROM part p JOIN l2 ON l2.l_partkey = p.p_partkey
          )
          SELECT 100.0 * CAST(promo_revenue AS DOUBLE) /
                   CAST(total_revenue AS DOUBLE) AS promo_pct,
                 CAST(promo_revenue AS DOUBLE) AS promo_revenue,
                 CAST(total_revenue AS DOUBLE) AS total_revenue
          FROM sums""",

    "q104_ivm_multi_in" ->
      s"""WITH cl AS (
            SELECT l_returnflag, l_orderkey, l_suppkey, l_quantity,
                   SUM(w) AS c FROM (
              SELECT l_returnflag, l_orderkey, l_suppkey, l_quantity, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_orderkey, l_suppkey, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4 HAVING SUM(w) > 0
          ), el AS (
            SELECT l_returnflag, l_orderkey, l_suppkey, l_quantity FROM (
              SELECT l_returnflag, l_orderkey, l_suppkey, l_quantity,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM cl)
          )
          SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(l_quantity) AS sum_qty
          FROM el
          WHERE EXISTS (
            SELECT 1 FROM el e2
            WHERE e2.l_orderkey = el.l_orderkey
              AND e2.l_suppkey = el.l_suppkey AND e2.l_quantity > 49)
          GROUP BY 1""",

    "q105_ivm_union_distinct" ->
      s"""WITH ol AS (
            SELECT o_orderkey, SUM(w) AS c FROM (
              SELECT o_orderkey, 1 AS w FROM orders WHERE o_totalprice > 400000
              UNION ALL
              SELECT o_orderkey, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_totalprice > 400000
            ) GROUP BY 1 HAVING SUM(w) > 0
          ), ll AS (
            SELECT l_orderkey, SUM(w) AS c FROM (
              SELECT l_orderkey, 1 AS w FROM lineitem WHERE l_quantity > 47
              UNION ALL
              SELECT l_orderkey, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
              WHERE l_quantity > 47
            ) GROUP BY 1 HAVING SUM(w) > 0
          )
          SELECT l_orderkey AS k FROM ll
          UNION
          SELECT o_orderkey AS k FROM ol""",

    "q116_tpch_q17_native" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_quantity, l_extendedprice,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_quantity, l_extendedprice, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_partkey, l_quantity, l_extendedprice,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), a AS (
            SELECT l_partkey, SUM(l_quantity * m) / SUM(m) AS avgq
            FROM l2 GROUP BY 1
          ), sums AS (
            SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) * l2.m)
                     AS total_price,
                   CAST(SUM(l2.m) AS BIGINT) AS n
            FROM part p
            JOIN l2 ON l2.l_partkey = p.p_partkey
            JOIN a ON a.l_partkey = l2.l_partkey
            WHERE p.p_brand = 'Brand#12'
              AND l2.l_quantity < 0.2 * a.avgq
          )
          SELECT CAST(total_price AS DOUBLE) AS total_price, n FROM sums""",

    // The estimate gate is computed Spark-side (rank-error window vs exact
    // percentiles in the same view); the oracle pins group set + counts.
    "q117_ivm_approx_percentile" ->
      s"""WITH applied AS (
            SELECT event_type, value FROM events
            UNION ALL
            SELECT event_type, value FROM ($DE) WHERE $M
          )
          SELECT event_type, TRUE AS est_ok, CAST(COUNT(*) AS BIGINT) AS n
          FROM applied GROUP BY 1""",

    // Heavy-hitter containment is asserted Spark-side (NO_FALSE_NEGATIVES
    // vs the exact mode); the oracle pins group set + counts.
    "q118_ivm_approx_topk" ->
      s"""WITH applied AS (
            SELECT event_type, user_id FROM events
            UNION ALL
            SELECT event_type, user_id FROM ($DE) WHERE $M
          )
          SELECT event_type, TRUE AS est_ok, CAST(COUNT(*) AS BIGINT) AS n
          FROM applied GROUP BY 1""",

    // Two-level cascade recomputed flat: signed per-(type, hour) counts
    // with group death (HAVING), then the per-type summary. epoch_us//3.6e9
    // ≡ the engine's nanos DIV 3600000000000 (same integer floor).
    "q119_ivm_cascade" ->
      s"""WITH w AS (
            SELECT event_type, epoch_us(ts) // 3600000000 AS hr, 1 AS w
            FROM events
            UNION ALL
            SELECT event_type, epoch_us(ts) // 3600000000,
                   CASE WHEN $M THEN 1 ELSE -1 END
            FROM ($DE)
          ), up AS (
            SELECT event_type, hr, CAST(SUM(w) AS BIGINT) AS hits
            FROM w GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT event_type, CAST(SUM(hits) AS BIGINT) AS total,
                 CAST(MAX(hits) AS BIGINT) AS peak,
                 CAST(COUNT(*) AS BIGINT) AS hours
          FROM up GROUP BY 1""",

    "q120_ivm_cdc_sketch" ->
      """WITH ins AS (
            SELECT event_type, user_id FROM events
            UNION ALL
            SELECT event_type, user_id + 1000000 AS user_id FROM events
            WHERE event_id % 37 = 0 AND event_id % 2 = 0
            UNION ALL
            SELECT event_type, user_id + 2000000 AS user_id FROM events
            WHERE event_id % 59 = 0
          ), del AS (
            SELECT event_type, user_id FROM events WHERE event_id % 37 = 0
          ), applied AS (
            SELECT * FROM ins EXCEPT ALL SELECT * FROM del
          )
          SELECT event_type, TRUE AS est_ok,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM applied GROUP BY 1""",

    // Streaming fold of the whole delta == one-shot batch application.
    "q122_ivm_stream_e2e" ->
      s"""SELECT event_type,
            CAST(SUM(CAST(value AS DECIMAL(18,2)) * w) AS DOUBLE) AS sum_value,
            CAST(SUM(user_id * w) AS BIGINT) AS sum_uid,
            CAST(SUM(w) AS BIGINT) AS n
          FROM (
            SELECT event_type, value, user_id, 1 AS w FROM events
            UNION ALL
            SELECT event_type, value, user_id,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DE)
          ) GROUP BY event_type HAVING SUM(w) > 0""",

    // Maintained dedup == the full MinHash pipeline over post-delta docs.
    "q123_ivm_dedup_minhash" -> maintainedMinhashOracle,

    // Streaming cascade == the same post-delta pair set (the delta
    // algebra commutes across micro-batch interleavings), so the q123
    // batch oracle gates the stream-fed cascade verbatim.
    "q133_ivm_stream_dedup_cascade" -> maintainedMinhashOracle,

    // Maintained near-dup == blocked cosine pairs over post-delta vectors.
    "q124_ivm_dedup_embedding" ->
      s"""WITH applied AS (
            SELECT vec_id, label, embedding FROM (
              SELECT vec_id, label, embedding, 1 AS w FROM embeddings
              UNION ALL
              SELECT vec_id, label, embedding,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w
              FROM (SELECT *, (vec_id % 2 = 0) AS $M FROM embeddings
                    WHERE vec_id % 17 = 0)
            ) GROUP BY vec_id, label, embedding HAVING SUM(w) > 0
          ), p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            ${cosineSql("a.embedding", "b.embedding")} AS cosine
          FROM applied a JOIN applied b
            ON a.label = b.label AND a.vec_id < b.vec_id)
          SELECT DISTINCT a_id, b_id, round(cosine, 6) AS cosine FROM p
          WHERE cosine >= 0.35""",

    // Maintained decontamination == distinct-shingle overlap counts over
    // the post-delta corpus vs the post-delta eval split.
    "q125_ivm_decontaminate" ->
      s"""WITH applied AS (
            SELECT doc_id, text FROM (
              SELECT doc_id, text, 1 AS w FROM documents
              UNION ALL
              SELECT doc_id, text, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DD)
            ) GROUP BY doc_id, text HAVING SUM(w) > 0
          ),
          t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM applied),
          sh0 AS (SELECT doc_id AS id, toks,
            unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM t),
          sh AS (SELECT DISTINCT id,
            concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS shingle FROM sh0
            WHERE len(string_split(concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]), ' ')) = 3),
          hits AS (SELECT c.id AS c_id, b.id AS b_id,
              count(DISTINCT c.shingle) AS hits
            FROM sh c JOIN sh b ON c.shingle = b.shingle
              AND c.id >= 20 AND b.id < 20
            GROUP BY 1, 2)
          SELECT c_id, b_id, CAST(hits AS INT) AS hits FROM hits
          WHERE hits >= 3""",

    // Maintained curation == the full pipeline over the post-delta corpus.
    "q126_ivm_curation" ->
      s"""WITH applied AS (
            SELECT doc_id, text FROM (
              SELECT doc_id, text, 1 AS w FROM documents
              UNION ALL
              SELECT doc_id, text, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DD)
            ) GROUP BY doc_id, text HAVING SUM(w) > 0
          ), sampled AS (
            SELECT * FROM applied
            WHERE (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 80
          ), scored0 AS (${textAnalyzeSql("sampled")}),
          scored AS (
            SELECT s.doc_id, s.text, a.pred_lang, a.n_tokens,
                   CAST(round(a.quality, 9) AS DECIMAL(18,9)) AS quality
            FROM sampled s JOIN scored0 a USING (doc_id)
            WHERE a.quality > 0.5
          ), kept AS (
            SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
                   arg_min(pred_lang, doc_id) AS keep_lang,
                   arg_min(n_tokens, doc_id) AS keep_tokens,
                   arg_min(quality, doc_id) AS keep_quality
            FROM scored GROUP BY 1
          )
          SELECT keep_lang AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(keep_tokens) AS BIGINT) AS n_tokens,
                 round(CAST(SUM(keep_quality) AS DOUBLE) / COUNT(*), 6)
                   AS avg_quality
          FROM kept GROUP BY 1""",

    // Two concurrent streams folding == one-shot application of both
    // deltas (q73's oracle — the final state is interleaving-independent).
    "q127_ivm_multistream_e2e" ->
      s"""WITH o2 AS (
            SELECT o_orderkey, o_orderpriority, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_orderpriority, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_orderpriority,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), l2 AS (
            SELECT l_orderkey, l_quantity, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT o_orderpriority, SUM(l_quantity * o2.m * l2.m) AS sum_qty,
                 CAST(SUM(o2.m * l2.m) AS BIGINT) AS cnt
          FROM o2 JOIN l2 ON o_orderkey = l_orderkey
          GROUP BY 1""",

    // Pre-delta snapshot == the plain base query (no delta applied).
    "q115_time_travel" ->
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM lineitem GROUP BY 1, 2""",

    "q106_tpch_q7" ->
      s"""WITH l2 AS (
            SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount,
                   l_shipdate, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount,
                     l_shipdate, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount,
                     l_shipdate, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4, 5 HAVING SUM(w) > 0
          ), o2 AS (
            SELECT o_orderkey, o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l2.l_shipdate) AS BIGINT) AS l_year,
                 CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(3,2)) -
                           CAST(l2.l_discount AS DECIMAL(4,2)))
                          * l2.m * o2.m) AS DOUBLE) AS revenue
          FROM supplier s
          JOIN l2 ON l2.l_suppkey = s.s_suppkey
          JOIN o2 ON o2.o_orderkey = l2.l_orderkey
          JOIN customer c ON c.c_custkey = o2.o_custkey
          JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
          JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
          WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
          GROUP BY 1, 2, 3""",

    "q107_tpch_q8" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_orderkey, l_suppkey, l_extendedprice,
                   l_discount, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_orderkey, l_suppkey, l_extendedprice,
                     l_discount, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_partkey, l_orderkey, l_suppkey, l_extendedprice,
                     l_discount, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4, 5 HAVING SUM(w) > 0
          ), o2 AS (
            SELECT o_orderkey, o_custkey, o_orderdate,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, o_orderdate, 1 AS w FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              UNION ALL
              SELECT o_orderkey, o_custkey, o_orderdate,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), vols AS (
            SELECT CAST(year(o2.o_orderdate) AS BIGINT) AS o_year,
                   ns.n_name AS supp_nation,
                   CAST(l2.l_extendedprice AS DECIMAL(12,2)) *
                   (CAST(1 AS DECIMAL(3,2)) -
                    CAST(l2.l_discount AS DECIMAL(4,2))) AS vol,
                   l2.m * o2.m AS m
            FROM part p
            JOIN l2 ON l2.l_partkey = p.p_partkey
            JOIN o2 ON o2.o_orderkey = l2.l_orderkey
            JOIN customer c ON c.c_custkey = o2.o_custkey
            JOIN nation nc ON nc.n_nationkey = c.c_nationkey
            JOIN region r ON r.r_regionkey = nc.n_regionkey
            JOIN supplier sp ON sp.s_suppkey = l2.l_suppkey
            JOIN nation ns ON ns.n_nationkey = sp.s_nationkey
            WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
          ), sums AS (
            SELECT o_year,
                   SUM(CASE WHEN supp_nation = 'NATION_3'
                            THEN vol ELSE CAST(0 AS DECIMAL(12,2)) END * m)
                     AS nation_vol,
                   SUM(vol * m) AS total_vol
            FROM vols GROUP BY 1
          )
          SELECT o_year,
                 CAST(nation_vol AS DOUBLE) / CAST(total_vol AS DOUBLE)
                   AS mkt_share,
                 CAST(nation_vol AS DOUBLE) AS nation_vol,
                 CAST(total_vol AS DOUBLE) AS total_vol
          FROM sums""",

    "q108_tpch_q9" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_suppkey, l_extendedprice, l_discount,
                   l_shipdate, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_suppkey, l_extendedprice, l_discount,
                     l_shipdate, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_partkey, l_suppkey, l_extendedprice, l_discount,
                     l_shipdate, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3, 4, 5 HAVING SUM(w) > 0
          )
          SELECT n.n_name, CAST(year(l2.l_shipdate) AS BIGINT) AS o_year,
                 CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(3,2)) -
                           CAST(l2.l_discount AS DECIMAL(4,2))) * l2.m)
                      AS DOUBLE) AS sum_profit
          FROM part p
          JOIN l2 ON l2.l_partkey = p.p_partkey
          JOIN supplier sp ON sp.s_suppkey = l2.l_suppkey
          JOIN nation n ON n.n_nationkey = sp.s_nationkey
          WHERE p.p_name LIKE '%red%'
          GROUP BY 1, 2""",

    "q109_tpch_q11" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_suppkey, l_extendedprice,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_suppkey, l_extendedprice, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_partkey, l_suppkey, l_extendedprice,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), pv AS (
            SELECT l2.l_partkey,
                   SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) * l2.m) AS v
            FROM l2
            JOIN supplier s ON s.s_suppkey = l2.l_suppkey
            WHERE s.s_nationkey < 10
            GROUP BY 1
          )
          SELECT l_partkey, CAST(v AS DOUBLE) AS v FROM pv
          WHERE v > (SELECT SUM(v) FROM pv) * CAST(0.0009 AS DECIMAL(6,4))""",

    "q110_tpch_q16" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_suppkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_suppkey, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_partkey, l_suppkey,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT p.p_brand, p.p_size,
                 CAST(COUNT(DISTINCT l2.l_suppkey) AS BIGINT) AS supplier_cnt,
                 CAST(SUM(l2.m) AS BIGINT) AS n
          FROM part p
          JOIN l2 ON l2.l_partkey = p.p_partkey
          WHERE p.p_brand <> 'Brand#11'
            AND p.p_size IN (1, 5, 9, 13, 17, 21, 25)
            AND l2.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
          GROUP BY 1, 2""",

    "q111_tpch_q17" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_quantity, l_extendedprice,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_quantity, l_extendedprice, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_partkey, l_quantity, l_extendedprice,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), a AS (
            SELECT l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2)) * m) AS sumq,
                   CAST(SUM(m) AS BIGINT) AS cntq
            FROM l2 GROUP BY 1
          ), sums AS (
            SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2)) * l2.m)
                     AS total_price,
                   CAST(SUM(l2.m) AS BIGINT) AS n
            FROM part p
            JOIN l2 ON l2.l_partkey = p.p_partkey
            JOIN a ON a.l_partkey = l2.l_partkey
            WHERE p.p_brand = 'Brand#12'
              AND CAST(l2.l_quantity AS DECIMAL(18,2)) * a.cntq * 5 < a.sumq
          )
          SELECT CAST(total_price AS DOUBLE) / 7.0 AS avg_yearly,
                 CAST(total_price AS DOUBLE) AS total_price, n
          FROM sums""",

    "q112_tpch_q20" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_suppkey, l_quantity,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_suppkey, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_partkey, l_suppkey, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), k AS (
            SELECT l_suppkey FROM (
              SELECT l2.l_suppkey, SUM(l2.l_quantity * l2.m) AS q
              FROM l2
              JOIN part p ON p.p_partkey = l2.l_partkey
              WHERE p.p_name LIKE 'small%'
              GROUP BY 1)
            WHERE q > 2100
          )
          SELECT s_suppkey, s_name FROM supplier
          WHERE s_suppkey IN (SELECT l_suppkey FROM k)""",

    "q113_tpch_q21" ->
      s"""WITH l2 AS (
            SELECT l_orderkey, l_suppkey, l_shipdate,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_orderkey, l_suppkey, l_shipdate, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_suppkey, l_shipdate,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), o2 AS (
            SELECT o_orderkey, o_orderdate, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_orderdate, 1 AS w FROM orders
              WHERE o_orderstatus = 'F'
              UNION ALL
              SELECT o_orderkey, o_orderdate,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_orderstatus = 'F'
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), j AS (
            SELECT o2.o_orderkey, l2.l_suppkey,
                   CASE WHEN l2.l_shipdate > o2.o_orderdate + INTERVAL 60 DAY
                        THEN 1 ELSE 0 END AS late,
                   l2.m * o2.m AS m
            FROM o2 JOIN l2 ON l2.l_orderkey = o2.o_orderkey
          ), ns AS (
            SELECT o_orderkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
                     AS nsupp
            FROM j GROUP BY 1
          ), nl AS (
            SELECT o_orderkey, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
                     AS nlate
            FROM j WHERE late = 1 GROUP BY 1
          )
          SELECT s.s_name, CAST(SUM(j.m) AS BIGINT) AS numwait
          FROM j
          JOIN ns ON ns.o_orderkey = j.o_orderkey
          JOIN nl ON nl.o_orderkey = j.o_orderkey
          JOIN supplier s ON s.s_suppkey = j.l_suppkey
          WHERE j.late = 1 AND ns.nsupp >= 2 AND nl.nlate = 1
          GROUP BY 1""",

    "q114_tpch_q22" ->
      s"""WITH o2 AS (
            SELECT o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_custkey, 1 AS w FROM orders
              WHERE o_totalprice > 430000.0
              UNION ALL
              SELECT o_custkey, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
              WHERE o_totalprice > 430000.0
            ) GROUP BY 1 HAVING SUM(w) > 0
          ), pos AS (
            SELECT CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey % 5 IN (1, 2, 3)
          )
          SELECT CAST(c_nationkey % 5 AS BIGINT) AS code,
                 CAST(COUNT(*) AS BIGINT) AS numcust,
                 CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   AS totacctbal
          FROM customer
          WHERE c_nationkey % 5 IN (1, 2, 3)
            AND CAST(c_acctbal AS DECIMAL(12,2)) *
                  (SELECT COUNT(*) FROM pos) > (SELECT SUM(bal) FROM pos)
            AND c_custkey NOT IN (SELECT o_custkey FROM o2)
          GROUP BY 1""",

    "q103_ivm_approx_distinct" ->
      s"""WITH applied AS (
            SELECT event_type, user_id FROM events
            UNION ALL
            SELECT event_type, user_id FROM ($DE) WHERE $M
          )
          SELECT event_type, TRUE AS est_ok,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM applied GROUP BY 1""",

    "q101_tpch_q15" ->
      s"""WITH l2 AS (
            SELECT l_suppkey, l_extendedprice, l_discount,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_suppkey, l_extendedprice, l_discount, 1 AS w
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
              UNION ALL
              SELECT l_suppkey, l_extendedprice, l_discount,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
              WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), rev AS (
            SELECT l_suppkey AS s_suppkey,
                   SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                       (CAST(1 AS DECIMAL(3,2)) -
                        CAST(l_discount AS DECIMAL(4,2))) * m) AS total
            FROM l2 GROUP BY 1
          )
          SELECT s_suppkey, CAST(total AS DOUBLE) AS total FROM rev
          WHERE total = (SELECT MAX(total) FROM rev)""",

    "q102_tpch_q2" ->
      s"""WITH l2 AS (
            SELECT l_partkey, l_suppkey, l_extendedprice,
                   CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT l_partkey, l_suppkey, l_extendedprice, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_partkey, l_suppkey, l_extendedprice,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), el AS (
            SELECT l_partkey, l_suppkey, l_extendedprice FROM (
              SELECT l_partkey, l_suppkey, l_extendedprice,
                     unnest(range(CAST(m AS BIGINT))) AS i FROM l2)
          ), mins AS (
            SELECT l_partkey, MIN(l_extendedprice) AS minp FROM el GROUP BY 1
          )
          SELECT p.p_partkey, p.p_brand, el.l_suppkey, el.l_extendedprice
          FROM part p
          JOIN el ON el.l_partkey = p.p_partkey
          JOIN mins ON mins.l_partkey = p.p_partkey
          WHERE p.p_size = 30 AND el.l_extendedprice = mins.minp""",

    "q100_pack" ->
      """WITH t AS (
           SELECT doc_id, doc_id % 16 AS bucket,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents
         ), s AS (
           SELECT doc_id, bucket, n_tokens,
                  COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS start_off
           FROM t)
         SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
                CAST(start_off // 256 AS BIGINT) AS example_id,
                CAST(start_off % 256 AS BIGINT) AS example_off,
                n_tokens
         FROM s""",

    "q91_ivm_bool_agg" ->
      s"""SELECT l_returnflag,
                 CASE WHEN SUM(CASE WHEN l_quantity IS NOT NULL THEN w ELSE 0 END) > 0
                      THEN SUM(CASE WHEN l_quantity < 49 THEN w ELSE 0 END)
                           = SUM(CASE WHEN l_quantity IS NOT NULL THEN w ELSE 0 END)
                      END AS all_small,
                 CASE WHEN SUM(CASE WHEN l_discount IS NOT NULL THEN w ELSE 0 END) > 0
                      THEN SUM(CASE WHEN l_discount > 0.09 THEN w ELSE 0 END) > 0
                      END AS any_deep,
                 CAST(SUM(w) AS BIGINT) AS n
          FROM (
            SELECT l_returnflag, l_quantity, l_discount, 1 AS w FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_quantity, l_discount,
                   CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
          ) GROUP BY 1 HAVING SUM(w) > 0""",

    "q89_ivm_intersect_all" ->
      s"""WITH cl AS (
            SELECT l_returnflag, l_quantity, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), el AS (
            SELECT l_returnflag, l_quantity FROM (
              SELECT l_returnflag, l_quantity,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM cl)
          )
          SELECT l_quantity AS q FROM el WHERE l_returnflag = 'R'
          INTERSECT ALL
          SELECT l_quantity AS q FROM el WHERE l_returnflag = 'A'""",

    "q90_ivm_except_all" ->
      s"""WITH cl AS (
            SELECT l_returnflag, l_quantity, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), el AS (
            SELECT l_returnflag, l_quantity FROM (
              SELECT l_returnflag, l_quantity,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM cl)
          )
          SELECT l_quantity AS q FROM el WHERE l_returnflag = 'R'
          EXCEPT ALL
          SELECT l_quantity AS q FROM el WHERE l_returnflag = 'A'""",

    "q88_ivm_self_join" ->
      s"""WITH cl AS (
            SELECT l_orderkey, l_linenumber, SUM(w) AS c FROM (
              SELECT l_orderkey, l_linenumber, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), el AS (
            SELECT l_orderkey, l_linenumber FROM (
              SELECT l_orderkey, l_linenumber,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM cl)
          )
          SELECT x.l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS pairs
          FROM el x JOIN el y ON x.l_orderkey = y.l_orderkey
          WHERE x.l_linenumber < y.l_linenumber
          GROUP BY 1""",

    "q87_ivm_window_rank" ->
      s"""WITH ap AS (
            SELECT l_returnflag, SUM(l_quantity * w) AS sum_qty FROM (
              SELECT l_returnflag, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, sum_qty,
                 CAST(RANK() OVER (ORDER BY sum_qty DESC, l_returnflag)
                      AS BIGINT) AS rnk,
                 sum_qty / SUM(sum_qty) OVER () AS share
          FROM ap""",

    "q86_ivm_share_of_total" ->
      s"""WITH ap AS (
            SELECT l_orderkey, l_linenumber, l_quantity, SUM(w) AS c FROM (
              SELECT l_orderkey, l_linenumber, l_quantity, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), tot AS (
            SELECT CAST(SUM(l_quantity * w) AS DOUBLE) AS t FROM (
              SELECT l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_quantity, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            )
          ), expanded AS (
            SELECT l_orderkey, l_linenumber, l_quantity FROM (
              SELECT l_orderkey, l_linenumber, l_quantity,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM ap)
          )
          SELECT e.l_orderkey, e.l_linenumber, e.l_quantity / tot.t AS q_share
          FROM expanded e, tot""",

    "q84_ivm_listagg_apply" ->
      s"""WITH ap AS (
            SELECT l_orderkey, l_linenumber, SUM(w) AS c FROM (
              SELECT l_orderkey, l_linenumber, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          ), expanded AS (
            SELECT l_orderkey, l_linenumber FROM (
              SELECT l_orderkey, l_linenumber,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM ap)
          )
          SELECT l_orderkey,
                 string_agg(CAST(l_linenumber AS VARCHAR),
                            ',' ORDER BY l_linenumber) AS lns,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM expanded GROUP BY l_orderkey""",

    "q83_ivm_scalar_subquery" ->
      s"""WITH ap AS (
            SELECT l_orderkey, l_linenumber, l_quantity, SUM(w) AS c FROM (
              SELECT l_orderkey, l_linenumber, l_quantity, 1 AS w
              FROM lineitem
              UNION ALL
              SELECT l_orderkey, l_linenumber, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          ), a AS (
            SELECT CAST(SUM(l_quantity * w) AS DOUBLE) /
                   CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                                 THEN w ELSE 0 END) AS DOUBLE) AS avg_q
            FROM (
              SELECT l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_quantity, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            )
          ), expanded AS (
            SELECT l_orderkey, l_linenumber, l_quantity FROM (
              SELECT l_orderkey, l_linenumber, l_quantity,
                     unnest(range(CAST(c AS BIGINT))) AS i FROM ap)
          )
          SELECT e.l_orderkey, e.l_linenumber, e.l_quantity
          FROM expanded e, a WHERE e.l_quantity > a.avg_q""",

    "q55_stratified_sample" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         MIN(event_id) AS min_id, MAX(event_id) AS max_id
         FROM events
         WHERE (CAST(CONCAT('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100)
               < (CASE event_type WHEN 'click' THEN 60 WHEN 'view' THEN 5 ELSE 25 END)
         GROUP BY event_type""",

    "q43_ivm_union_apply" ->
      s"""SELECT src, CAST(SUM(amt * w) AS DOUBLE) AS total,
          CAST(SUM(w) AS BIGINT) AS n
          FROM (
            SELECT 'L' AS src, CAST(l_extendedprice AS DECIMAL(18,2)) AS amt,
                   1 AS w FROM lineitem
            UNION ALL
            SELECT 'L', CAST(l_extendedprice AS DECIMAL(18,2)),
                   CASE WHEN $M THEN 1 ELSE -1 END FROM ($DL)
            UNION ALL
            SELECT 'O', CAST(o_totalprice AS DECIMAL(18,2)), 1 FROM orders
            UNION ALL
            SELECT 'O', CAST(o_totalprice AS DECIMAL(18,2)),
                   CASE WHEN $M THEN 1 ELSE -1 END FROM ($DO_)
          ) GROUP BY src HAVING SUM(w) > 0""",

    "q44_ivm_intersect_apply" ->
      s"""WITH ap AS (
            SELECT l_returnflag, l_linestatus, l_quantity FROM (
              SELECT l_returnflag, l_linestatus, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_linestatus, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, l_linestatus FROM ap WHERE l_quantity > 48
          INTERSECT
          SELECT l_returnflag, l_linestatus FROM ap WHERE l_quantity < 3""",

    "q45_ivm_except_apply" ->
      s"""WITH ap AS (
            SELECT l_partkey, l_linenumber, l_quantity FROM (
              SELECT l_partkey, l_linenumber, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_partkey, l_linenumber, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0
          )
          SELECT (l_partkey % 997) AS pb, l_linenumber FROM ap WHERE l_quantity > 25
          EXCEPT
          SELECT (l_partkey % 997), l_linenumber FROM ap WHERE l_quantity > 49""",

    "q40_ivm_semi_join" ->
      s"""WITH l2 AS (
            SELECT l_orderkey FROM (
              SELECT l_orderkey, 1 AS w FROM lineitem WHERE l_linenumber % 2 = 1
              UNION ALL
              SELECT l_orderkey, CASE WHEN $M THEN 1 ELSE -1 END AS w
              FROM ($DL) WHERE l_linenumber % 2 = 1
            ) GROUP BY 1 HAVING SUM(w) > 0
          )
          SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
          FROM orders WHERE o_orderkey IN (SELECT l_orderkey FROM l2)""",

    "q41_ivm_anti_join" ->
      s"""WITH o2 AS (
            SELECT o_custkey FROM (
              SELECT o_custkey, o_orderkey, 1 AS w FROM orders
              WHERE o_orderpriority = '1-URGENT'
              UNION ALL
              SELECT o_custkey, o_orderkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
              WHERE o_orderpriority = '1-URGENT'
            ) GROUP BY o_custkey, o_orderkey HAVING SUM(w) > 0
          )
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
          FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM o2)""",

    "q38_immv_groupby_expr" ->
      s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS syear,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * w) AS DOUBLE) AS sum_qty,
          CAST(SUM(w) AS BIGINT) AS cnt
          FROM (
            SELECT l_shipdate, l_quantity, 1 AS w FROM lineitem
            UNION ALL
            SELECT l_shipdate, l_quantity,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
          ) GROUP BY 1 HAVING SUM(w) > 0""",

    "q39_immv_nested_sql" ->
      s"""WITH o2 AS (
            SELECT o_custkey, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY o_orderkey, o_custkey HAVING SUM(w) > 0
          ), c1 AS (
            SELECT c_custkey, CAST(COALESCE(SUM(m), 0) AS BIGINT) AS c_count
            FROM customer LEFT OUTER JOIN o2 ON c_custkey = o_custkey
            GROUP BY c_custkey
          )
          SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
          FROM c1 GROUP BY c_count""",

    "q12_ivm_distinct_apply" ->
      s"""SELECT l_returnflag, l_linestatus, l_quantity FROM (
            SELECT l_returnflag, l_linestatus, l_quantity, 1 AS w FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
          ) GROUP BY 1, 2, 3 HAVING SUM(w) > 0""",

    "q19_ivm_having_apply" ->
      s"""SELECT l_returnflag, l_linestatus, SUM(l_quantity * w) AS sum_qty,
          CAST(SUM(w) AS BIGINT) AS cnt
          FROM (
            SELECT l_returnflag, l_linestatus, l_quantity, 1 AS w FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_linestatus, l_quantity,
                   CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
          ) GROUP BY l_returnflag, l_linestatus
          HAVING SUM(w) > 0 AND SUM(w) % 2 = 0""",

    "q17_ivm_right_join_apply" ->
      s"""WITH o2 AS (
            SELECT o_custkey, o_totalprice, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY o_orderkey, o_custkey, o_totalprice HAVING SUM(w) > 0
          ), oe AS (
            SELECT o_custkey, o_totalprice FROM
              (SELECT o_custkey, o_totalprice, unnest(range(m)) FROM o2)
          )
          SELECT c_mktsegment, CAST(COUNT(o_totalprice) AS BIGINT) AS cnt_orders,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM oe RIGHT JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment""",

    "q18_ivm_full_join_apply" ->
      s"""WITH dc AS ($DC),
          c2 AS (
            SELECT c_custkey, c_acctbal, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT c_custkey, c_acctbal, 1 AS w FROM customer
              UNION ALL
              SELECT c_custkey, c_acctbal,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM dc
            ) GROUP BY c_custkey, c_acctbal HAVING SUM(w) > 0
          ), ce AS (
            SELECT c_custkey, c_acctbal FROM
              (SELECT c_custkey, c_acctbal, unnest(range(m)) FROM c2)
          ), o2 AS (
            SELECT o_custkey, o_totalprice, CAST(SUM(w) AS BIGINT) AS m FROM (
              SELECT o_orderkey, o_custkey, o_totalprice, 1 AS w FROM orders
              UNION ALL
              SELECT o_orderkey, o_custkey, o_totalprice,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DO_)
            ) GROUP BY o_orderkey, o_custkey, o_totalprice HAVING SUM(w) > 0
          ), oe AS (
            SELECT o_custkey, o_totalprice FROM
              (SELECT o_custkey, o_totalprice, unnest(range(m)) FROM o2)
          )
          SELECT CAST(COUNT(c_acctbal) AS BIGINT) AS n_c,
                 CAST(COUNT(o_totalprice) AS BIGINT) AS n_o,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM ce FULL OUTER JOIN oe ON c_custkey = o_custkey""",

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

    "q20_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id,
         CAST(COUNT(*) AS BIGINT) AS n_copies FROM documents GROUP BY md5(text)""",

    "q21_dedup_jaccard" ->
      s"""$ShingleCte,
          kept AS (SELECT sh.id, sh.shingle FROM sh JOIN (
              SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 100) f
            USING (shingle)),
          sizes AS (SELECT id, COUNT(*) AS c FROM kept GROUP BY id),
          pairs AS (SELECT a.id AS a_id, b.id AS b_id, COUNT(*) AS inter
            FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.id < b.id
            GROUP BY a.id, b.id)
          SELECT a_id, b_id,
            CAST(inter AS DOUBLE) / (na.c + nb.c - inter) AS jaccard
          FROM pairs JOIN sizes na ON na.id = a_id JOIN sizes nb ON nb.id = b_id
          WHERE CAST(inter AS DOUBLE) / (na.c + nb.c - inter) >= 0.5""",

    "q22_dedup_minhash" ->
      s"$minhashPairsCtes SELECT a_id, b_id FROM pairs",

    // stride = 64 - 16 = 48; chunk i covers toks[48i+1 .. 48i+64]
    "q80_chunk" ->
      """WITH t AS (
           SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         ), c AS (
           SELECT doc_id, toks, len(toks) AS n_tokens,
                  unnest(range((greatest(len(toks) - 16, 1) + 47) // 48))
                    AS chunk_id
           FROM t)
         SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64],
                                ' ') AS chunk_text,
                CAST(least(64, n_tokens - chunk_id * 48) AS INT)
                  AS n_chunk_tokens
         FROM c""",

    "q75_redact" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\d{3}[-.]\\d{3,4}[-.]\\d{4}"
      val ssn = "\\d{3}-\\d{2}-\\d{4}"
      s"""WITH aug AS (
            SELECT doc_id,
              text || ' contact user' || doc_id || '@mail.example or 555-' ||
              CAST(doc_id % 900 + 100 AS VARCHAR) || '-1234 ssn 123-45-' ||
              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
            FROM documents)
          SELECT doc_id,
            CAST(len(regexp_extract_all(text, '$email')) AS INT) AS n_emails,
            CAST(len(regexp_extract_all(text, '$phone')) AS INT) AS n_phones,
            CAST(len(regexp_extract_all(text, '$ssn')) AS INT) AS n_ids,
            regexp_replace(regexp_replace(regexp_replace(text,
              '$email', '<EMAIL>', 'g'),
              '$phone', '<PHONE>', 'g'),
              '$ssn', '<ID>', 'g') AS redacted
          FROM aug"""
    },

    "q72_decontaminate" ->
      s"""$ShingleCte
          SELECT c.id AS doc_id, b.id AS bench_id,
                 CAST(COUNT(*) AS BIGINT) AS hits
          FROM sh c JOIN sh b ON c.shingle = b.shingle
          WHERE c.id % 101 <> 0 AND b.id % 101 = 0
          GROUP BY 1, 2 HAVING COUNT(*) >= 2""",

    // Transitive closure of the undirected pair graph via a recursive CTE;
    // each node's component rep = the minimum reachable id (including
    // itself), mirroring min-label propagation's fixpoint exactly.
    "q64_dedup_clusters" ->
      s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
          edges AS (SELECT a_id AS x, b_id AS y FROM pairs
                    UNION SELECT b_id, a_id FROM pairs),
          reach(x, label) AS (
            SELECT x, x FROM (SELECT DISTINCT x FROM edges)
            UNION
            SELECT e.x, r.label FROM edges e JOIN reach r ON e.y = r.x
          ),
          comp AS (SELECT x AS id, MIN(label) AS rep FROM reach GROUP BY x)
          SELECT rep, CAST(COUNT(*) AS BIGINT) AS size, MAX(id) AS max_id
          FROM comp GROUP BY rep""",

    "q23_dedup_simhash" ->
      s"SELECT doc_id, ${simhashSql("text")} AS simhash FROM documents",

    "q24_dedup_embedding" ->
      s"""WITH p AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
            ${cosineSql("a.embedding", "b.embedding")} AS cosine
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
          SELECT a_id, b_id, round(cosine, 6) AS cosine FROM p
          WHERE cosine >= 0.35""",

    "q25_ann_topk" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    // full-corpus re-rank of the PQ shortlist == brute force
    "q74_ann_pq" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    // exhaustive-probe IVF over the ON-DISK index == brute force too
    "q53_ann_ivf_disk" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    // exhaustive-probe IVF == brute force, so the oracle is q25's query
    "q52_ann_ivf" ->
      s"""WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM embeddings c, embeddings q
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    "q26_ann_bucketed" ->
      s"""WITH e AS (SELECT vec_id, embedding,
            ${signBucketSql("embedding", 8)} AS bucket FROM embeddings),
          scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM e c JOIN e q ON c.bucket = q.bucket
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    "q27_text_analyze" -> textAnalyzeSql(),

    // Mixture rebalancing == the same derived rates + md5 threshold,
    // recomputed analytically (scale = min n/w over the weighted langs).
    "q135_mixture_sample" ->
      """WITH w(lang, wt) AS (VALUES ('en', 0.4), ('zh', 0.2), ('es', 0.2),
                                     ('de', 0.1), ('fr', 0.1)),
          c AS (SELECT lang, CAST(COUNT(*) AS DOUBLE) AS n
                FROM documents GROUP BY lang),
          s AS (SELECT MIN(n / wt) AS scale FROM c JOIN w USING (lang)),
          r AS (SELECT lang, least(1.0, scale * wt / n) AS rate
                FROM c JOIN w USING (lang) CROSS JOIN s)
          SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
                 MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
          FROM documents d JOIN r USING (lang)
          WHERE (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000)
                < CAST(floor(rate * 1000000.0) AS BIGINT)
          GROUP BY d.lang""",

    "q42_hash_split" ->
      """SELECT (CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10) AS split,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         FROM documents GROUP BY 1""",

    // FakeCodec mirror: 16-bin byte histogram of the UTF-8 payload. The
    // corpus is ASCII (verified), so byte == character code and DuckDB can
    // recompute the exact integer bin counts from the text.
    "q50_multimodal_features" ->
      """WITH m AS (SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'wav' END AS format,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes, text
           FROM documents),
         b AS (SELECT media_id, format, n_bytes, text,
           unnest(range(0, 16)) AS bin FROM m)
         SELECT media_id, format, n_bytes, CAST(bin AS INT) AS bin,
           CAST(len(list_filter(
             list_transform(string_split(text, ''), c -> ascii(c)),
             x -> x // 16 = bin)) AS BIGINT) AS bin_count
         FROM b""",

    // sampleFrames mirror: slice arithmetic over the ASCII payload.
    "q51_multimodal_frames" ->
      """WITH m AS (SELECT doc_id AS media_id, text,
           CAST(doc_id % 7 + 1 AS INT) AS n_frames,
           octet_length(encode(text)) AS plen FROM documents),
         f AS (SELECT media_id, text,
           greatest(plen // n_frames, 1) AS flen,
           unnest(range(0, n_frames, 2)) AS frame_idx FROM m)
         SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
           substr(text, CAST(frame_idx * flen + 1 AS INT), CAST(flen AS INT))
             AS frame_payload
         FROM f""",

    // pixelHistogram mirror: PNG is lossless, pixels are pure arithmetic —
    // DuckDB recomputes the decoded histogram from the formula alone.
    "q121_multimodal_decode" ->
      """SELECT d.doc_id AS media_id,
           CAST(((d.doc_id * 31 + 7 * x.x + 13 * y.y) % 256) // 16 AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS bin_count
         FROM documents d, range(0, 16) x(x), range(0, 12) y(y)
         GROUP BY 1, 2""",

    "q130_multimodal_audio" ->
      """SELECT d.doc_id AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MIN((d.doc_id * 31 + 17 * t.i) % 65536 - 32768) AS INT) AS min_s,
           CAST(MAX((d.doc_id * 31 + 17 * t.i) % 65536 - 32768) AS INT) AS max_s,
           CAST(SUM((d.doc_id * 31 + 17 * t.i) % 65536 - 32768) AS BIGINT) AS sum_s
         FROM documents d, range(0, 256) t(i)
         GROUP BY 1""",

    "q131_multimodal_frames_real" ->
      """SELECT d.doc_id AS media_id, CAST(f.f AS INT) AS frame_idx,
           CAST(SUM((d.doc_id * 31 + 7 * x.x + 13 * y.y + 97 * f.f) % 256)
                AS BIGINT) AS pixel_sum
         FROM documents d, (VALUES (0), (2), (4)) f(f),
              range(0, 8) x(x), range(0, 6) y(y)
         GROUP BY 1, 2""",

    // maintained IVF with exhaustive probe ≡ brute force over the
    // POST-DELTA corpus (the q52 equivalence, composed with the applied
    // multiset)
    "q132_ivm_ann_ivf" ->
      s"""WITH applied AS (
            SELECT vec_id, embedding FROM (
              SELECT vec_id, embedding, 1 AS w FROM embeddings
              UNION ALL
              SELECT vec_id, embedding,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w
              FROM (SELECT *, (vec_id % 2 = 0) AS $M FROM embeddings
                    WHERE vec_id % 17 = 0)
            ) GROUP BY vec_id, embedding HAVING SUM(w) > 0
          ), scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM applied c, applied q
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    // Maintained PQ codes with an exhaustive (corpus-wide) shortlist:
    // ADC-shortlist + exact re-rank degenerates to brute-force top-k over
    // the post-delta corpus — same analytic oracle shape as q132.
    "q134_ivm_pq_codes" ->
      s"""WITH applied AS (
            SELECT vec_id, embedding FROM (
              SELECT vec_id, embedding, 1 AS w FROM embeddings
              UNION ALL
              SELECT vec_id, embedding,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w
              FROM (SELECT *, (vec_id % 2 = 0) AS $M FROM embeddings
                    WHERE vec_id % 17 = 0)
            ) GROUP BY vec_id, embedding HAVING SUM(w) > 0
          ), scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS n_id,
              round(${cosineSql("q.embedding", "c.embedding")}, 6) AS cosine
            FROM applied c, applied q
            WHERE q.vec_id < 8 AND q.vec_id <> c.vec_id)
          SELECT q_id, n_id, cosine, rank FROM (
            SELECT q_id, n_id, cosine, CAST(row_number() OVER (
              PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
            FROM scored) WHERE rank <= 5""",

    "q32_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q33_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",

    "q34_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(COUNT(*) AS BIGINT) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    // Salting is invisible in the result — the oracle is the plain GROUP BY.
    "q28_skew_salted_agg" ->
      """SELECT event_type,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         CAST(COUNT(*) AS BIGINT) AS n, MAX(value) AS max_value
         FROM events GROUP BY event_type""",

    "q30_events_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ), s AS (
           SELECT user_id, ts, value,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
           FROM e
         )
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM s GROUP BY user_id, session_id""",

    "q31_events_json" ->
      """SELECT event_type,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_k,
         CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
         FROM events GROUP BY event_type""",

    "q29_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS "hour", event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY 1, 2""",

    "q36_asof_join" ->
      """SELECT l.event_id,
         (SELECT epoch_us(max(r.ts)) FROM events r
           WHERE r.user_id = l.user_id AND r.event_type = 'view'
             AND r.ts <= l.ts) AS prev_view_us,
         CAST((SELECT count(*) FROM events r
           WHERE r.user_id = l.user_id AND r.event_type = 'view'
             AND r.ts <= l.ts) AS BIGINT) AS n_prior_views
         FROM events l WHERE l.event_type = 'click'""",

    "q37_range_join" ->
      """SELECT l.event_id,
         CAST(count(r.ts) AS BIGINT) AS n_views,
         epoch_us(max(r.ts)) AS last_view_us
         FROM events l LEFT JOIN events r
           ON r.event_type = 'view'
          AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts
         WHERE l.event_type = 'click'
         GROUP BY l.event_id""",

    "q128_ivm_shared_aux_apply" ->
      s"""WITH a AS (
            SELECT l_returnflag, l_quantity, SUM(w) AS c FROM (
              SELECT l_returnflag, l_quantity, 1 AS w FROM lineitem
              UNION ALL
              SELECT l_returnflag, l_quantity,
                     CASE WHEN $M THEN 1 ELSE -1 END AS w FROM ($DL)
            ) GROUP BY 1, 2 HAVING SUM(w) > 0
          )
          SELECT l_returnflag, MIN(l_quantity) AS min_qty,
                 MAX(l_quantity) AS max_qty,
                 CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS nd_qty,
                 CAST(SUM(DISTINCT l_quantity) AS DOUBLE) AS sd_qty,
                 CAST(SUM(c) AS BIGINT) AS cnt
          FROM a GROUP BY l_returnflag""",

    "q129_ivm_insert_only_minmax" ->
      s"""WITH a AS (
            SELECT l_returnflag, l_quantity, l_orderkey FROM lineitem
            UNION ALL
            SELECT l_returnflag, l_quantity, l_orderkey FROM ($DL) WHERE $M
          )
          SELECT l_returnflag, MIN(l_quantity) AS min_qty,
            MAX(l_quantity) AS max_qty,
            (list(l_orderkey ORDER BY l_quantity DESC, l_orderkey DESC))[1]
              AS biggest_order,
            CAST(COUNT(*) AS BIGINT) AS cnt
          FROM a GROUP BY l_returnflag""",
  )

  // ---------------------------------------------- oracle SQL generators

  /** Distinct 3-token shingles per doc — mirror of ops.Dedup.shingles.
    * DuckDB lists are 1-based; out-of-range indexing yields NULL which
    * concat_ws skips, exactly like Spark's element_at + concat_ws. */
  /** MinHash-LSH candidate pairs as a reusable CTE chain ending in
    * `pairs(a_id, b_id)` — mirror of ops.Dedup.minhashLshPairs. */
  /** mh0..mh7 minhash select list / band-key list — shared between the
    * batch (q22/q64) and maintained (q123) dedup oracles. */
  private val MhSelect = (0 until 8).map(s0 =>
    s"MIN(substr(md5(concat('${s0 / 4}', '|', shingle)), ${1 + 8 * (s0 % 4)}, 8)) AS mh$s0")
    .mkString(", ")
  private val BandKeySelect = (0 until 4).map(b =>
    s"md5(concat_ws('|', mh${2 * b}, mh${2 * b + 1}))").mkString(", ")

  /** Post-delta MinHash pair set — the oracle for BOTH the batch-driven
    * (q123) and stream-fed (q133) maintained dedup cascades. */
  private lazy val maintainedMinhashOracle: String =
    s"""WITH applied AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text, 1 AS w FROM documents
            UNION ALL
            SELECT doc_id, text, CASE WHEN $M THEN 1 ELSE -1 END FROM ($DD)
          ) GROUP BY doc_id, text HAVING SUM(w) > 0
        ),
        t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM applied),
        sh0 AS (SELECT doc_id AS id, toks,
          unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM t),
        sh AS (SELECT DISTINCT id,
          concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS shingle FROM sh0
          WHERE len(string_split(concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]), ' ')) = 3),
        $minhashTailCtes
        SELECT a_id, b_id FROM pairs"""

  /** sig/banded/pairs CTE chain over an existing `sh(id, shingle)` CTE. */
  private def minhashTailCtes: String =
    s"""sig AS (SELECT id, $MhSelect FROM sh GROUP BY id),
        banded AS (SELECT id, unnest([0,1,2,3]) AS band,
          unnest([$BandKeySelect]) AS band_key FROM sig),
        pairs AS (SELECT DISTINCT a.id AS a_id, b.id AS b_id FROM banded a
          JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
            AND a.id < b.id)"""

  private lazy val minhashPairsCtes: String =
    s"""$ShingleCte,
        $minhashTailCtes"""

  private val ShingleCte =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       sh0 AS (SELECT doc_id AS id, toks,
         unnest(range(0, greatest(len(toks) - 3, 0) + 1)) AS i FROM t),
       sh AS (SELECT DISTINCT id,
         concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]) AS shingle FROM sh0
         WHERE len(string_split(concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]), ' ')) = 3)"""

  /** Mirror of ops.Dedup.simhash: 32-bit fingerprint, all integer math. */
  private def simhashSql(text: String): String = {
    val bits = (0 until 32).map { b =>
      val d = b / 4 + 1
      val r = b % 4
      val contrib =
        s"""list_sum(list_transform(list_distinct(string_split($text, ' ')),
            t -> ((strpos('0123456789abcdef', substr(md5(t), $d, 1)) - 1) // ${1 << r}) % 2 * 2 - 1))"""
      s"(CASE WHEN $contrib > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END)"
    }
    bits.mkString("(", " + ", ")")
  }

  /** Mirror of ops.Similarity.cosine: sequential-fold dot / (norm·norm). */
  private def cosineSql(a: String, b: String): String = {
    def sum2(x: String, y: String) =
      s"""list_sum(list_transform(range(1, len($x) + 1),
          i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"""
    s"(${sum2(a, b)} / (sqrt(${sum2(a, a)}) * sqrt(${sum2(b, b)})))"
  }

  /** Mirror of ops.Similarity.signBucket. */
  private def signBucketSql(v: String, nBits: Int): String =
    (0 until nBits).map { i =>
      s"(CASE WHEN $v[${i + 1}] >= 0 THEN (CAST(1 AS BIGINT) << $i) ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Mirror of ops.TextOps.analyze. */
  private def textAnalyzeSql(from: String = "documents"): String = {
    import ops.TextOps.{Stopwords, BpePattern, FpMod}
    def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    val langs = Stopwords.keys.toSeq.sorted
    def hits(l: String) =
      s"len(list_intersect(list_distinct(string_split(text, ' ')), ${sqlList(Stopwords(l))}))"
    // CASE chain with the same tiebreak as TextOps.langId
    val cases = langs.init.map { l =>
      val earlier = langs.takeWhile(_ != l).map(e => s"${hits(l)} > ${hits(e)}")
      val later = langs.dropWhile(_ != l).drop(1).map(e => s"${hits(l)} >= ${hits(e)}")
      s"WHEN ${(earlier ++ later).mkString(" AND ")} THEN '$l'"
    }.mkString(" ")
    val allStops = sqlList(Stopwords.values.flatten.toSeq.distinct.sorted)
    val nTok = "len(string_split(text, ' '))"
    val swr = s"CAST(len(list_filter(string_split(text, ' '), t -> list_contains($allStops, t))) AS DOUBLE) / $nTok"
    val pr = s"CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) / length(text)"
    s"""SELECT doc_id,
        CAST($nTok AS INT) AS n_tokens,
        CAST(len(regexp_extract_all(text, '$BpePattern')) AS INT) AS n_bpe_tokens,
        CAST(length(replace(text, ' ', '')) AS DOUBLE) / $nTok AS mean_token_len,
        $swr AS stopword_ratio,
        $pr AS punct_ratio,
        (least(CAST($nTok AS DOUBLE) / 50.0, 1.0) + ($swr) + (1.0 - ($pr))) / 3 AS quality,
        CASE $cases ELSE '${langs.last}' END AS pred_lang,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(text, ' '),
            t -> CAST(ascii(t) * 131 + length(t) AS BIGINT))),
          (a, b) -> (a * 31 + b) % $FpMod) AS fingerprint
        FROM $from"""
  }
}
