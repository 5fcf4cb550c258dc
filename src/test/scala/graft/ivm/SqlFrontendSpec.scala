package graft.ivm

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** CREATE IMMV DDL (EP3) end-to-end: statements in the reference's own SQL
  * style register views whose delta pipelines match the golden results. */
class SqlFrontendSpec extends AnyFunSuite with SparkTestBase {

  private def fixtures(): Unit = {
    df("a INT, b STRING, c STRING",
      Seq(Row(3, "true", "blah"), Row(4, "false", "foo")))
      .createOrReplaceTempView("hello")
    df(s"a INT, b STRING, c STRING, ${IvmCore.MULT} BOOLEAN", Seq(
      Row(1, "k", "Mark", true),
      Row(2, "k", "Hannes", false)))
      .createOrReplaceTempView("delta_hello")
  }

  test("CREATE IMMV ... GROUP BY (reference tests/ivm.test:76-82 via SQL)") {
    fixtures()
    val (name, _) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_v1 AS SELECT b, SUM(a) AS sum_a, COUNT(c) AS count_c FROM hello GROUP BY b")
    assert(name == "sql_v1")
    assertRows(Ivm.upsert(spark, "sql_v1"), Set(
      Seq("k", 1, 1, true),
      Seq("k", 2, 1, false)))
  }

  test("CREATE IMMV with FILTER (WHERE ...) on aggregates") {
    fixtures()
    SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_vf AS
         SELECT b, SUM(a) FILTER (WHERE c <> 'Mark') AS sum_nm,
                COUNT(*) FILTER (WHERE a > 1) AS cnt_big
         FROM hello GROUP BY b""")
    // delta rows: (1,k,Mark,+) — both filters reject; (2,k,Hannes,-) — both pass
    assertRows(Ivm.upsert(spark, "sql_vf"), Set(
      Seq("k", null, 0L, true),
      Seq("k", 2L, 1L, false)))
  }

  test("CREATE IMMV with GROUP BY ROLLUP/CUBE folds to the level compositions") {
    def levels(n: IvmQuery): Int = n match {
      case Union(l, r) => levels(l) + levels(r)
      case _           => 1
    }
    val (_, ru) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_ru AS SELECT b, c, SUM(a) AS sa FROM hello GROUP BY ROLLUP(b, c)")
    assert(levels(ru) == 3, ru) // (b,c), (b), ()
    val (_, cu) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_cu AS SELECT b, c, COUNT(*) AS n FROM hello GROUP BY CUBE(b, c)")
    assert(levels(cu) == 4, cu) // (b,c), (b), (c), ()
    val (_, gs) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_gs AS SELECT b, c, COUNT(*) AS n FROM hello
         GROUP BY GROUPING SETS ((b, c), (c), ())""")
    assert(levels(gs) == 3, gs) // exactly the listed sets
  }

  test("CREATE IMMV with ORDER BY + LIMIT folds to the TopK decoration") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_tk AS SELECT a, b FROM hello WHERE a > 0
         ORDER BY a DESC, b LIMIT 7""")
    q match {
      case TopK(_: Project, sort, 7) =>
        assert(sort == Seq("a" -> false, "b" -> true), sort)
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("CREATE IMMV with WHERE and SELECT *") {
    fixtures()
    SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_v2 AS SELECT * FROM hello WHERE a > 1")
    assertRows(Ivm.upsert(spark, "sql_v2"), Set(Seq(2, "k", "Hannes", false)))
  }

  test("CREATE IMMV with JOIN USING registers a Z-delta-capable view") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_v3 AS
         SELECT g, SUM(v) AS sv, COUNT(*) AS n
         FROM t JOIN u USING (g) GROUP BY g""")
    q match {
      case Aggregate(Join(Scan("t"), Scan("u"), Seq("g")), Seq("g"), aggs) =>
        assert(aggs.map(_.name) == Seq("sv", "n"))
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("CREATE IMMV with LEFT/RIGHT/FULL OUTER JOIN folds to the outer-join nodes") {
    val (_, ql) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_loj AS SELECT * FROM t LEFT OUTER JOIN u USING (g)")
    assert(ql == LeftJoin(Scan("t"), Scan("u"), Seq("g")), ql)
    val (_, qr) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_roj AS SELECT * FROM t RIGHT OUTER JOIN u USING (g)")
    assert(qr == RightJoin(Scan("t"), Scan("u"), Seq("g")), qr)
    val (_, qf) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_foj AS SELECT * FROM t FULL OUTER JOIN u ON t.g = u.g")
    assert(qf == FullJoin(Scan("t"), Scan("u"), Seq("g")), qf)
  }

  test("CREATE IMMV with HAVING folds to Filter over the aggregate output") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_hav AS
         SELECT g, SUM(v) AS sv, COUNT(*) AS n
         FROM t GROUP BY g HAVING COUNT(*) > 2 AND n < 100""")
    q match {
      case Filter(Aggregate(Scan("t"), Seq("g"), aggs), _) =>
        assert(aggs.map(_.name) == Seq("sv", "n"))
      case other => fail(s"unexpected AST: $other")
    }
    // HAVING aggregate not in the select list is rejected loudly
    intercept[UnsupportedOperationException] {
      SqlFrontend.createImmv(spark,
        "CREATE IMMV bad_hav AS SELECT g, COUNT(*) AS n FROM t GROUP BY g HAVING SUM(v) > 0")
    }
  }

  test("GROUP BY expression folds to Project below Aggregate; refresh == recompute") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_gexp AS
         SELECT a % 2 AS par, SUM(a) AS sum_a, COUNT(*) AS n
         FROM t GROUP BY a % 2""")
    q match {
      case Aggregate(Project(Scan("t"), cols), Seq("par"), aggs) =>
        assert(aggs.map(_.name) == Seq("sum_a", "n"))
        assert(cols.map(ZDelta.colName).contains("par"))
      case other => fail(s"unexpected AST: $other")
    }
    // GROUP BY alias reference resolves to the same shape
    val (_, q2) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_gals AS SELECT a % 2 AS par, SUM(a) AS sum_a, COUNT(*) AS n FROM t GROUP BY par")
    assert(q2 == q, s"alias GROUP BY folded differently: $q2 vs $q")
    // full cycle on a live store: create, refresh with deletes, compare
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("a INT", Seq(Row(1), Row(2), Row(3), Row(4), Row(5)))
    }
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"a INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row(6, true), Row(1, false), Row(3, false), Row(5, false))))
      case _   => None
    }
    Ivm.create("sql_gexp", q, base, store)
    Ivm.refreshState("sql_gexp", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_gexp", q, store), Ivm.recompute(q, base, deltas))
    // a grouping expression not present in the select list is rejected
    intercept[UnsupportedOperationException] {
      SqlFrontend.createImmv(spark,
        "CREATE IMMV bad_gexp AS SELECT SUM(a) AS s FROM t GROUP BY a % 2")
    }
  }

  test("nested FROM sub-select folds (poster Q13 shape in pure SQL)") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_nested AS
         SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders USING (c_custkey)
           GROUP BY c_custkey
         ) GROUP BY c_count""")
    q match {
      case Aggregate(
          Aggregate(LeftJoin(Scan("customer"), Scan("orders"), Seq("c_custkey")),
            Seq("c_custkey"), inner), Seq("c_count"), outer) =>
        assert(inner.map(_.name) == Seq("c_count"))
        assert(outer.map(_.name) == Seq("custdist"))
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("IN-subquery folds to a maintained semi join (distinct key set)") {
    val (_, q) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_semi AS SELECT a, b FROM t WHERE a IN (SELECT x FROM u WHERE y > 0)")
    q match {
      case Project(Join(Scan("t"), Aggregate(inner, Seq("a"), Seq()), Seq("a")), _) =>
        inner match {
          case Project(Project(Filter(Scan("u"), _), _), _) => ()
          case other => fail(s"unexpected inner AST: $other")
        }
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("semi/anti compositions refresh == recompute through membership transitions") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions.col
    val base: String => DataFrame = {
      case "t" => df("k INT, v STRING",
        Seq(Row(1, "a"), Row(2, "b"), Row(3, "c"), Row(4, "d")))
      case "u" => df("k INT, y INT",
        Seq(Row(1, 10), Row(1, 11), Row(2, 20)))
    }
    // k=2 loses its only supporter (leaves semi, enters anti); k=3 gains
    // one (enters semi, leaves anti); k=1 loses one of two (no change)
    val deltas: String => Option[DataFrame] = {
      case "u" => Some(df(s"k INT, y INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row(2, 20, false), Row(3, 30, true), Row(1, 10, false))))
      case _   => None
    }
    val semi = IvmQuery.semiJoin(Scan("t"), Project(Scan("u"), Seq(col("k"))), Seq("k"))
    val anti = IvmQuery.antiJoin(Scan("t"), Project(Scan("u"), Seq(col("k"))),
      Seq("k"), leftCols = Seq(col("k"), col("v")))
    for ((nm, q) <- Seq("semi_v" -> semi, "anti_v" -> anti)) {
      val store = new MemStore
      Ivm.create(nm, q, base, store)
      Ivm.refreshState(nm, q, base, deltas, store)
      assertSameRows(Ivm.read(nm, q, store), Ivm.recompute(q, base, deltas))
    }
  }

  test("UNION ALL folds to the stateless bag-union node") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_union AS
         SELECT g, SUM(v) AS sv FROM (
           SELECT g, v FROM t UNION ALL SELECT g, h AS v FROM u
         ) GROUP BY g""")
    q match {
      case Aggregate(Union(Project(Scan("t"), _), Project(Scan("u"), _)),
          Seq("g"), aggs) => assert(aggs.map(_.name) == Seq("sv"))
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("INTERSECT / EXCEPT fold to distinct-set compositions") {
    val (_, qi) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_int AS SELECT g, h FROM t INTERSECT SELECT g, h FROM u")
    qi match {
      case Join(Aggregate(_, Seq("g", "h"), Seq()), Aggregate(_, Seq("g", "h"), Seq()),
          Seq("g", "h")) => ()
      case other => fail(s"unexpected INTERSECT AST: $other")
    }
    val (_, qe) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_exc AS SELECT g, h FROM t EXCEPT SELECT g, h FROM u")
    qe match {
      case Project(Filter(LeftJoin(Aggregate(_, Seq("g", "h"), Seq()), _, _), _), _) => ()
      case other => fail(s"unexpected EXCEPT AST: $other")
    }
  }

  test("WITH (CTE) folds by substitution; chained defs; refresh == recompute") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_cte AS
         WITH pos AS (SELECT g, v FROM t WHERE v > 0),
              perg AS (SELECT g, COUNT(*) AS n FROM pos GROUP BY g)
         SELECT n, COUNT(*) AS dist FROM perg GROUP BY n""")
    q match {
      case Aggregate(
          Aggregate(Project(Filter(Scan("t"), _), _), Seq("g"), inner),
          Seq("n"), outer) =>
        assert(inner.map(_.name) == Seq("n"))
        assert(outer.map(_.name) == Seq("dist"))
      case other => fail(s"unexpected CTE AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT",
        Seq(Row("a", 1), Row("a", 2), Row("b", 3), Row("b", -1), Row("c", 5)))
    }
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("c", 6, true), Row("a", 1, false), Row("b", 3, false))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_cte", q, base, store)
    Ivm.refreshState("sql_cte", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_cte", q, store), Ivm.recompute(q, base, deltas))
  }

  test("variance family folds from SQL and maintains under deletion") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_var AS
         SELECT g, VAR_SAMP(v) AS vv, STDDEV(v) AS sd, VAR_POP(v) AS vp,
                STDDEV_POP(v) AS sp, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), aggs) =>
        assert(aggs.map(_.name) == Seq("vv", "sd", "vp", "sp", "n"))
        assert(aggs.count(AggSpec.isMoment2) == 4)
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT",
        Seq(Row("a", 1), Row("a", 4), Row("a", 9), Row("b", 7), Row("b", 7),
          Row("c", 2)))
    }
    // delete one of b's equal values (variance stays 0, n drops), delete
    // a's extremum, insert into the singleton group c (NULL→defined samp)
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("b", 7, false), Row("a", 9, false), Row("c", 8, true))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_var", q, base, store)
    Ivm.refreshState("sql_var", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_var", q, store), Ivm.recompute(q, base, deltas))
  }

  test("covar/corr fold from SQL and maintain under pairwise deletion") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_cov AS
         SELECT g, COVAR_POP(v, h) AS cp, COVAR_SAMP(v, h) AS cs,
                CORR(v, h) AS r, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), aggs) =>
        assert(aggs.map(_.name) == Seq("cp", "cs", "r", "n"))
        assert(aggs.count(AggSpec.isMomentXY) == 3)
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT, h INT",
        Seq(Row("a", 1, 2), Row("a", 4, 8), Row("a", 9, 1), Row("b", 7, 7),
          Row("b", 3, 7), Row("c", 2, null)))
    }
    // delete one b pair (leaves a single pair: samp → NULL, corr → NULL
    // since var is 0), delete a's (9,1), insert a complete pair into c
    // (its only base row has a NULL side and never counted as a pair)
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, h INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("b", 3, 7, false), Row("a", 9, 1, false), Row("c", 5, 6, true))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_cov", q, base, store)
    Ivm.refreshState("sql_cov", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_cov", q, store), Ivm.recompute(q, base, deltas))
  }

  test("LISTAGG/STRING_AGG folds from SQL; deletion drops one occurrence") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_la AS
         SELECT g, STRING_AGG(v, '-') AS lv, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), Seq(la: AggSpec.ListAgg, _)) =>
        assert(la.sep == "-" && la.name == "lv")
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT",
        Seq(Row("a", 3), Row("a", 1), Row("a", 3), Row("b", 2), Row("c", null)))
    }
    // delete ONE of a's duplicate 3s ("1-3-3" → "1-3"), empty b entirely,
    // give the all-NULL group c its first value (NULL → "7")
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 3, false), Row("b", 2, false), Row("c", 7, true))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_la", q, base, store)
    Ivm.refreshState("sql_la", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_la", q, store), Ivm.recompute(q, base, deltas))
    val rows = Ivm.read("sql_la", q, store).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("a") == "1-3" && !rows.contains("b") && rows("c") == "7")
  }

  test("inner join with residual ON conjuncts folds to Filter over Join") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_theta AS
         SELECT g, v, h FROM t JOIN u ON t.g = u.g AND t.v < u.h""")
    q match {
      case Project(Filter(Join(Scan("t"), Scan("u"), Seq("g")), _), _) => ()
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(Row("a", 1), Row("a", 9), Row("b", 3)))
      case "u" => df("g STRING, h INT", Seq(Row("a", 5), Row("b", 2)))
    }
    // raise b's bound so (b,3) starts matching; delete (a,5) so (a,1) stops
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "u" => Some(df(s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 5, false), Row("b", 7, true))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_theta", q, base, store)
    Ivm.refreshState("sql_theta", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_theta", q, store), Ivm.recompute(q, base, deltas))
    assert(Ivm.read("sql_theta", q, store).collect().map(
      r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet ==
      Set(("b", 3, 7)))
  }

  test("scalar subquery in the SELECT list folds to the ScalarDeco read decoration") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_share AS
         SELECT g, v, v / (SELECT SUM(v) FROM t) AS share FROM t""")
    // child (pruned to referenced attrs) and the 1-row SUM are SEPARATE
    // states: a delta refreshes both in O(||delta||); the division happens
    // at read — no O(|view|) state rewrite when the total moves
    q match {
      case ScalarDeco(Project(Scan("t"), cols),
          Seq(Aggregate(Scan("t"), Seq(), Seq(s))), out) =>
        assert(cols.map(ZDelta.colName) == Seq("g", "v"))
        assert(s.isInstanceOf[AggSpec.Sum] && s.name.startsWith("__ivm_sq"))
        assert(out.length == 3)
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v DOUBLE", Seq(Row("a", 1d), Row("b", 3d)))
    }
    // doubling the total halves every share — all rows rewrite
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v DOUBLE, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("c", 4d, true))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_share", q, base, store)
    Ivm.refreshState("sql_share", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_share", q, store), Ivm.recompute(q, base, deltas))
    assert(Ivm.read("sql_share", q, store).collect().map(
      r => (r.getString(0), r.getDouble(2))).toSet ==
      Set(("a", 0.125), ("b", 0.375), ("c", 0.5)))
  }

  test("scalar subquery in WHERE folds to a cross join with a global agg") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_sq AS
         SELECT g, v FROM t WHERE v > (SELECT AVG(h) FROM u)""")
    q match {
      case Project(Filter(Join(_, Aggregate(Scan("u"), Seq(), Seq(a)), Seq()), _), cols) =>
        assert(a.isInstanceOf[AggSpec.Avg] && a.name.startsWith("__ivm_sq"))
        assert(cols.map(ZDelta.colName) == Seq("g", "v"))
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT",
        Seq(Row("a", 1), Row("b", 5), Row("c", 9), Row("d", null)))
      case "u" => df("h INT", Seq(Row(2), Row(4), Row(12)))
    }
    // u's avg moves 6 → 3: b (v=5) newly qualifies, a/c unchanged, and a
    // t-side insert/delete lands in the same batch (self-termed deltas)
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "u" => Some(df(s"h INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row(12, false), Row(3, true))))
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("e", 4, true), Row("a", 1, false))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_sq", q, base, store)
    Ivm.refreshState("sql_sq", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_sq", q, store), Ivm.recompute(q, base, deltas))
  }

  test("CORRELATED scalar subquery decorrelates to a LEFT join on the key") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_csq AS
         SELECT g, v FROM t
         WHERE v > (SELECT 2 * AVG(u.h) FROM u WHERE u.g = g)""")
    q match {
      case Project(Filter(LeftJoin(Scan("t"),
          Aggregate(Scan("u"), Seq("g"), Seq(a)), Seq("g")), _), cols) =>
        assert(a.isInstanceOf[AggSpec.Avg] && a.name.startsWith("__ivm_sq"))
        assert(cols.map(ZDelta.colName) == Seq("g", "v"))
      case other => fail(s"unexpected AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT",
        Seq(Row("a", 9), Row("a", 1), Row("b", 5), Row("c", 7), Row("d", null)))
      case "u" => df("g STRING, h INT",
        Seq(Row("a", 2), Row("a", 4), Row("b", 1), Row("d", 8)))
    }
    // group a's threshold moves 6 → 2*3=6... then delta shifts it; group c
    // has NO inner group (scalar NULL → row never qualifies); group d's
    // NULL v never qualifies; deltas hit BOTH tables in one batch
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "u" => Some(df(s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 4, false), Row("b", 3, true)))) // a: avg 3→2, b: 1→2
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("b", 5, false), Row("c", 2, true))))
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_csq", q, base, store)
    Ivm.refreshState("sql_csq", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_csq", q, store), Ivm.recompute(q, base, deltas))
    // post-delta: a's threshold 2*2=4 → (a,9) in, (a,1) out; b empty after
    // delete of (b,5); c rows have no inner group → NULL comparison → out
    assertRows(Ivm.read("sql_csq", q, store), Set(Seq("a", 9)))
  }

  test("correlated scalar in the SELECT list LEFT-joins per-key aggregates") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_csel AS
         SELECT g, v, (SELECT SUM(u.h) FROM u WHERE u.g = g) AS tot
         FROM t""")
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(Row("a", 1), Row("c", 3)))
      case "u" => df("g STRING, h INT", Seq(Row("a", 2), Row("a", 5)))
    }
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "u" => Some(df(s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 5, false)))) // a's sum 7 → 2
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_csel", q, base, store)
    Ivm.refreshState("sql_csel", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_csel", q, store), Ivm.recompute(q, base, deltas))
    assertRows(Ivm.read("sql_csel", q, store),
      Set(Seq("a", 1, 2L), Seq("c", 3, null))) // no inner group → NULL
  }

  test("multi-column IN and plain UNION fold to semi/distinct compositions") {
    val (_, qi) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_min2 AS
         SELECT a, b FROM t WHERE (a, b) IN (SELECT x AS a, y AS b FROM u)""")
    qi match {
      case Project(Join(Scan("t"),
          Aggregate(_, Seq("a", "b"), Seq()), Seq("a", "b")), _) => ()
      case other => fail(s"unexpected multi-IN AST: $other")
    }
    val (_, qu) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_ud AS SELECT g FROM t UNION SELECT g FROM u")
    qu match {
      case Aggregate(Union(_, _), Seq("g"), Seq()) => ()
      case other => fail(s"unexpected UNION AST: $other")
    }
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(Row("a", 1), Row("b", 2)))
      case "u" => df("g STRING, h INT", Seq(Row("b", 1), Row("c", 2)))
    }
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 1, false), Row("d", 9, true)))) // a leaves t entirely
      case "u" => Some(df(s"g STRING, h INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("c", 2, false)))) // c leaves u entirely
      case _   => None
    }
    val store = new MemStore
    Ivm.create("sql_ud", qu, base, store)
    Ivm.refreshState("sql_ud", qu, base, deltas, store)
    assertSameRows(Ivm.read("sql_ud", qu, store), Ivm.recompute(qu, base, deltas))
    assertRows(Ivm.read("sql_ud", qu, store), Set(Seq("b"), Seq("d")))
  }

  test("NOT IN subquery folds to the anti-join composition (marker filter)") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_notin AS
         SELECT a, b FROM t WHERE a NOT IN (SELECT x FROM u WHERE y > 0)""")
    q match {
      case Project(Filter(LeftJoin(Scan("t"),
          Aggregate(_, Seq("a", IvmQuery.PRESENT), Seq()), Seq("a")), _), _) => ()
      case other => fail(s"unexpected NOT IN AST: $other")
    }
  }

  test("correlated EXISTS/NOT EXISTS fold to semi/anti compositions") {
    val (_, qe) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_ex AS
         SELECT a, b FROM t
         WHERE EXISTS (SELECT 1 FROM u WHERE u.a = t.a AND y > 0)""")
    qe match {
      case Project(Join(Scan("t"), Aggregate(inner, Seq("a"), Seq()), Seq("a")), _) =>
        inner match {
          case Project(Filter(Scan("u"), _), _) => ()
          case other => fail(s"unexpected inner AST: $other")
        }
      case other => fail(s"unexpected EXISTS AST: $other")
    }
    val (_, qn) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_nex AS
         SELECT a, b FROM t
         WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.a = t.a)""")
    qn match {
      case Project(Filter(LeftJoin(Scan("t"),
          Aggregate(_, Seq("a", IvmQuery.PRESENT), Seq()), Seq("a")), _), _) => ()
      case other => fail(s"unexpected NOT EXISTS AST: $other")
    }
    // correlation must be a same-name equi condition
    intercept[UnsupportedOperationException] {
      SqlFrontend.createImmv(spark,
        "CREATE IMMV bad_ex AS SELECT a FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.x = t.a)")
    }
  }

  test("min_by/max_by fold from SQL (arg order: min_by(arg, value))") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_mby AS
         SELECT g, MIN_BY(h, v) AS am, MAX_BY(h, v) AS ax, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), aggs) =>
        assert(aggs.map(_.name) == Seq("am", "ax", "n"))
        assert(aggs.count(AggSpec.needsAux) == 2)
      case other => fail(s"unexpected AST: $other")
    }
  }

  test("window functions fold to the WindowDeco read decoration; refresh == recompute") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_win AS
         SELECT g, n,
                RANK() OVER (ORDER BY n DESC, g ASC) AS rnk,
                SUM(n) OVER (PARTITION BY g) AS gtot
         FROM (SELECT g, COUNT(*) AS n FROM t GROUP BY g)""")
    q match {
      case WindowDeco(Aggregate(Scan("t"), Seq("g"), aggs), cols) =>
        assert(aggs.map(_.name) == Seq("n"))
        assert(cols.length == 4)
      case other => fail(s"unexpected AST: $other")
    }
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING", Seq(Row("a"), Row("a"), Row("b"), Row("c"), Row("c"), Row("c")))
    }
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("b", true), Row("b", true), Row("c", false), Row("d", true))))
      case _   => None
    }
    Ivm.create("sql_win", q, base, store)
    Ivm.refreshState("sql_win", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_win", q, store), Ivm.recompute(q, base, deltas))
    // window + ORDER BY/LIMIT compose: TopK over WindowDeco
    val (_, q2) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_win2 AS
         SELECT g, n, ROW_NUMBER() OVER (ORDER BY n DESC, g) AS rn
         FROM (SELECT g, COUNT(*) AS n FROM t GROUP BY g)
         ORDER BY rn LIMIT 2""")
    q2 match {
      case TopK(WindowDeco(_, _), Seq(("rn", true)), 2) => ()
      case other => fail(s"unexpected AST: $other")
    }
    Ivm.create("sql_win2", q2, base, store)
    Ivm.refreshState("sql_win2", q2, base, deltas, store)
    assertSameRows(Ivm.read("sql_win2", q2, store), Ivm.recompute(q2, base, deltas))
  }

  test("INTERSECT ALL / EXCEPT ALL fold to count-state compositions; refresh == recompute") {
    val (_, qi) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_ia AS SELECT g FROM t INTERSECT ALL SELECT g FROM u")
    qi match {
      case ExpandCount(Project(Join(
          Aggregate(_, Seq("g"), _),
          Aggregate(_, Seq("g"), _), Seq("g")), _), IvmQuery.CntN) => ()
      case other => fail(s"unexpected AST: $other")
    }
    val (_, qe) = SqlFrontend.createImmv(spark,
      "CREATE IMMV sql_ea AS SELECT g FROM t EXCEPT ALL SELECT g FROM u")
    val store = new MemStore
    // t = {a×3, b×1, c×2}, u = {a×1, c×3, d×1}
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING",
        Seq(Row("a"), Row("a"), Row("a"), Row("b"), Row("c"), Row("c")))
      case "u" => df("g STRING", Seq(Row("a"), Row("c"), Row("c"), Row("c"), Row("d")))
    }
    // Δt: +a (→4), −b (b dies); Δu: +a (→2), −d (d dies)
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", true), Row("b", false))))
      case "u" => Some(df(s"g STRING, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", true), Row("d", false))))
      case _   => None
    }
    for ((nm, q) <- Seq("sql_ia" -> qi, "sql_ea" -> qe)) {
      Ivm.create(nm, q, base, store)
      Ivm.refreshState(nm, q, base, deltas, store)
      assertSameRows(Ivm.read(nm, q, store), Ivm.recompute(q, base, deltas))
    }
    // post-refresh: t = {a×4, c×2}, u = {a×2, c×3} — check MULTIPLICITIES
    def counts(d: org.apache.spark.sql.DataFrame): Map[String, Int] =
      d.collect().map(_.getString(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(counts(Ivm.read("sql_ia", qi, store)) == Map("a" -> 2, "c" -> 2))
    assert(counts(Ivm.read("sql_ea", qe, store)) == Map("a" -> 2))
  }

  test("BOOL_AND/BOOL_OR fold and maintain via the two-count state") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_bool AS
         SELECT g, BOOL_AND(v > 0) AS all_pos, BOOL_OR(v > 10) AS any_big,
                COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), aggs) =>
        assert(aggs.map(_.name) == Seq("all_pos", "any_big", "n"))
        assert(aggs.count(AggSpec.needsAux) == 0) // fully self-maintainable
      case other => fail(s"unexpected AST: $other")
    }
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(
        Row("a", 5), Row("a", 20), Row("b", -1), Row("b", 3), Row("c", 15)))
    }
    // −(a,20): any_big flips true→false; −(b,−1): all_pos flips false→true;
    // +(c,−2): all_pos flips true→false; +(d,null): NULL input, n-only group
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN", Seq(
        Row("a", 20, false), Row("b", -1, false), Row("c", -2, true),
        Row("d", null, true))))
      case _   => None
    }
    Ivm.create("sql_bool", q, base, store)
    Ivm.refreshState("sql_bool", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_bool", q, store), Ivm.recompute(q, base, deltas))
    assertRows(Ivm.read("sql_bool", q, store), Set(
      Seq("a", true, false, 1L), Seq("b", true, false, 1L),
      Seq("c", false, true, 2L), Seq("d", null, null, 1L)))
  }

  test("MEDIAN/PERCENTILE maintain via the aux multiset; deletes shift the quantile") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_med AS
         SELECT g, MEDIAN(v) AS med, PERCENTILE(v, 0.9) AS p90, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), aggs) =>
        assert(aggs.count(AggSpec.needsAux) == 2)
      case other => fail(s"unexpected AST: $other")
    }
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(
        Row("a", 1), Row("a", 2), Row("a", 3), Row("a", 4), Row("a", 5),
        Row("b", 10), Row("b", 20)))
    }
    // delete a's median (3) → interpolate the middle pair (2+4)/2 = 3.0
    // (the VALUE leaves the multiset: p90 shifts), insert b 30
    val deltas: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN", Seq(
        Row("a", 3, false), Row("b", 30, true))))
      case _   => None
    }
    Ivm.create("sql_med", q, base, store)
    Ivm.refreshState("sql_med", q, base, deltas, store)
    assertSameRows(Ivm.read("sql_med", q, store), Ivm.recompute(q, base, deltas))
    assertRows(Ivm.read("sql_med", q, store), Set(
      Seq("a", 3.0, 4.7, 4L), Seq("b", 20.0, 28.0, 3L)))
  }

  test("APPROX_COUNT_DISTINCT maintains an HLL sketch; deletes rebuild the group") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_hll AS
         SELECT g, APPROX_COUNT_DISTINCT(v) AS au, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), Seq(a, _)) =>
        assert(a.isInstanceOf[AggSpec.ApproxCountDistinct])
      case other => fail(s"unexpected AST: $other")
    }
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(
        Row("a", 1), Row("a", 1), Row("a", 2), Row("b", 10), Row("b", null)))
    }
    val ins: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN", Seq(
        Row("a", 3, true), Row("a", 1, true), // 1 is a duplicate: au stays 3
        Row("c", 7, true))))
      case _ => None
    }
    Ivm.create("sql_hll", q, base, store)
    Ivm.refreshState("sql_hll", q, base, ins, store)
    // union of per-batch sketches ≡ one-shot sketch: refresh == recompute
    assertSameRows(Ivm.read("sql_hll", q, store), Ivm.recompute(q, base, ins))
    assertRows(Ivm.read("sql_hll", q, store), Set(
      Seq("a", 3L, 5L), Seq("b", 1L, 2L), Seq("c", 1L, 1L)))
    // a second batch keeps folding into the same registers
    val ins2: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("b", 11, true))))
      case _ => None
    }
    Ivm.refreshState("sql_hll", q, base, ins2, store)
    assertRows(Ivm.read("sql_hll", q, store)
        .where(org.apache.spark.sql.functions.col("g") === "b"),
      Set(Seq("b", 2L, 3L)))
    // a delete cannot fold into HLL registers — the touched group's
    // sketch REBUILDS from the post-batch rows instead (round 4)
    val del: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 1, false))))
      case _ => None
    }
    Ivm.refreshState("sql_hll", q, base, del, store)
    // one copy of (a,1) removed: a still holds {1,2,3} (au 3), n drops
    assertRows(Ivm.read("sql_hll", q, store), Set(
      Seq("a", 3L, 4L), Seq("b", 2L, 3L), Seq("c", 1L, 1L)))
  }

  test("APPROX_PERCENTILE maintains a KLL sketch; deletes rebuild the group") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_kll AS
         SELECT g, APPROX_PERCENTILE(v, 0.5) AS p50, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), Seq(a, _)) =>
        assert(a.isInstanceOf[AggSpec.ApproxPercentile])
      case other => fail(s"unexpected AST: $other")
    }
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v INT", Seq(
        Row("a", 1), Row("a", 2), Row("a", 3), Row("a", 4), Row("a", 5),
        Row("b", 10), Row("b", 20), Row("b", null)))
    }
    val ins: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN", Seq(
        Row("a", 6, true), Row("b", 30, true), Row("c", 7, true))))
      case _ => None
    }
    Ivm.create("sql_kll", q, base, store)
    Ivm.refreshState("sql_kll", q, base, ins, store)
    // below k retained items the sketch is exact AND merge ≡ one-shot build,
    // so refresh == recompute bit-for-bit here (only large groups see the
    // randomized-compaction rank-error window)
    assertSameRows(Ivm.read("sql_kll", q, store), Ivm.recompute(q, base, ins))
    // INCLUSIVE criteria: the smallest observed value with rank ≥ p
    assertRows(Ivm.read("sql_kll", q, store), Set(
      Seq("a", 3.0, 6L), Seq("b", 20.0, 4L), Seq("c", 7.0, 1L)))
    // a delete cannot fold into a KLL sketch — the touched group's
    // sketch REBUILDS from the post-batch rows instead (round 4); the
    // quantile visibly moves (a: {1,2,4,5,6} → p50 = 4)
    val del: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v INT, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", 3, false))))
      case _ => None
    }
    Ivm.refreshState("sql_kll", q, base, del, store)
    assertRows(Ivm.read("sql_kll", q, store), Set(
      Seq("a", 4.0, 5L), Seq("b", 20.0, 4L), Seq("c", 7.0, 1L)))
  }

  test("APPROX_TOP_K maintains a frequent-items sketch; deletes rebuild the group") {
    val (_, q) = SqlFrontend.createImmv(spark,
      """CREATE IMMV sql_freq AS
         SELECT g, APPROX_TOP_K(v, 2) AS hh, COUNT(*) AS n
         FROM t GROUP BY g""")
    q match {
      case Aggregate(Scan("t"), Seq("g"), Seq(a, _)) =>
        assert(a.isInstanceOf[AggSpec.ApproxTopK])
      case other => fail(s"unexpected AST: $other")
    }
    val store = new MemStore
    val base: String => org.apache.spark.sql.DataFrame = {
      case "t" => df("g STRING, v STRING", Seq(
        Row("a", "x"), Row("a", "x"), Row("a", "y"), Row("a", "z"),
        Row("b", "q"), Row("b", null)))
    }
    val ins: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v STRING, ${IvmCore.MULT} BOOLEAN", Seq(
        Row("a", "y", true), Row("a", "y", true), // y overtakes x: 3 vs 2
        Row("c", "m", true))))
      case _ => None
    }
    Ivm.create("sql_freq", q, base, store)
    Ivm.refreshState("sql_freq", q, base, ins, store)
    // below maxMapSize distinct items the counters are exact and merge ≡
    // one-shot build, so refresh == recompute including list order
    assertSameRows(Ivm.read("sql_freq", q, store), Ivm.recompute(q, base, ins))
    assertRows(Ivm.read("sql_freq", q, store), Set(
      Seq("a", Seq("y", "x"), 6L), Seq("b", Seq("q"), 2L),
      Seq("c", Seq("m"), 1L)))
    // a delete cannot fold into the counters — the touched group's
    // sketch REBUILDS from the post-batch rows instead (round 4); the
    // deleted value's LAST copy vanishing must drop it from the list
    val del: String => Option[org.apache.spark.sql.DataFrame] = {
      case "t" => Some(df(s"g STRING, v STRING, ${IvmCore.MULT} BOOLEAN",
        Seq(Row("a", "z", false))))
      case _ => None
    }
    Ivm.refreshState("sql_freq", q, base, del, store)
    assertRows(Ivm.read("sql_freq", q, store), Set(
      Seq("a", Seq("y", "x"), 5L), Seq("b", Seq("q"), 2L),
      Seq("c", Seq("m"), 1L)))
  }

  test("unsupported SQL raises like the reference's NotImplementedException") {
    intercept[UnsupportedOperationException] {
      SqlFrontend.createImmv(spark,
        "CREATE IMMV bad AS SELECT b, BIT_OR(a) AS m FROM hello GROUP BY b")
    }
    // ORDER BY with no LIMIT: an unbounded sort is presentation, not a
    // maintainable view (ORDER BY + LIMIT folds to TopK since round 4)
    intercept[UnsupportedOperationException] {
      SqlFrontend.createImmv(spark,
        "CREATE IMMV bad2 AS SELECT * FROM hello ORDER BY a")
    }
  }

  test("non-IMMV statements are rejected") {
    intercept[IllegalArgumentException] {
      SqlFrontend.createImmv(spark, "SELECT 1")
    }
  }
}
