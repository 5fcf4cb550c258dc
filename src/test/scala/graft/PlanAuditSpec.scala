package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the properties that make these operators viable at
  * 100 TB, asserted so a refactor cannot silently regress them.
  *
  * (Executed plans are inspected as strings — the stable, version-tolerant
  * way to assert "has a broadcast join" / "reads only these columns".)
  */
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: DataFrame): String = {
    df.collect() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }
  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("delta aggregate (q04): pruned scan, partial+final agg, one exchange") {
    val p = plan(q("q04_ivm_agg_groupby"))
    assert(p.contains("HashAggregate"), p)
    // column-pruned parquet scan: discount/tax/partkey/suppkey not read
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_discount") && !p.contains("l_partkey"),
      "delta agg scan must prune unused columns")
  }

  test("join delta (q09): every delta term is a broadcast join, base never shuffles") {
    val p = plan(q("q09_ivm_join_delta"))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 3, s"expected 3 broadcast delta-join terms:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "delta joins must not sort-merge (base side would shuffle)")
  }

  test("ANN brute force (q25): corpus side has no shuffle before ranking") {
    val p = plan(q("q25_ann_topk"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
  }

  test("ANN top-k (q25/q26): partial per-salt top-k precedes the global window") {
    // two Window operators: the salted partial rank bounds what the global
    // per-query ranking shuffles to salts×k rows per query
    for (name <- Seq("q25_ann_topk", "q26_ann_bucketed")) {
      val p = plan(q(name))
      val windows = "RunningWindowFunction|Window".r.findAllIn(p).length
      assert(windows >= 2, s"$name: expected partial+global windows:\n$p")
    }
  }

  test("outer-join deltas (q17/q18 shape): broadcast terms, base never sort-merges") {
    // audit the DELTA PLAN of a right-outer view directly (the gated
    // queries wrap it in create/refresh; the delta plan is the hot loop)
    import graft.ivm._
    import org.apache.spark.sql.functions.{col, count, lit}
    val base = graft.Fixtures.base(spark, dir)
    val deltas = graft.Fixtures.deltas(spark, dir)
    val v = RightJoin(
      Project(Scan("orders"),
        Seq(col("o_custkey").as("custkey"), col("o_totalprice"))),
      Project(Scan("customer"),
        Seq(col("c_custkey").as("custkey"), col("c_mktsegment"))),
      Seq("custkey"))
    val store = new MemStore
    store.put("v/r.lcnt", base("orders")
      .groupBy(col("o_custkey").as("custkey")).agg(count(lit(1)).as(IvmCore.HCOUNT)))
    val ctx = ZDelta.Ctx(base, deltas, p => store(s"v/$p"),
      sliceFn = (p, kdf, ks) => store.slice(s"v/$p", kdf, ks))
    val dv = ZDelta.delta(v, ctx)
    val p = plan(dv)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"outer delta terms must broadcast the small side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "outer-join delta must not sort-merge (base side would shuffle)")
    ctx.pins.foreach(_.unpersist())
  }

  test("TPC-H Q7 shape (q106): 6-way join plans with broadcast dims, no sort-merge") {
    // recompute plan of the folded view — the same join tree the delta
    // terms reuse; every dim (supplier/customer/nation×2/orders at this
    // scale) must broadcast against the fact rather than shuffle it
    val (_, v) = graft.ivm.SqlFrontend.createImmv(spark,
      """CREATE IMMV audit_q7 AS
             SELECT supp_nation, cust_nation,
                    CAST(year(l_shipdate) AS BIGINT) AS l_year,
                    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS revenue
             FROM (SELECT s_suppkey AS l_suppkey, s_nationkey FROM supplier) s
             JOIN (SELECT l_orderkey AS o_orderkey, l_suppkey,
                          l_extendedprice, l_shipdate FROM lineitem) l
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
             GROUP BY supp_nation, cust_nation, l_year""")
    val p = plan(graft.ivm.Ivm.recompute(v,
      graft.Fixtures.base(spark, dir), _ => None))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4,
      s"dims must broadcast in the 6-way join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the fact side must not sort-merge at this dim/fact ratio:\n$p")
  }

  test("exact dedup (q20): partial aggregation before the exchange") {
    val p = plan(q("q20_dedup_exact"))
    val firstAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstAgg >= 0 && exchange >= 0, p)
    // partial (map-side) aggregate appears below the exchange in the tree —
    // string order: final agg, exchange, partial agg
    assert(p.lastIndexOf("HashAggregate") > exchange,
      "map-side partial aggregation must precede the shuffle")
  }

  test("text analysis (q27): single pass, no shuffle at all") {
    val p = plan(q("q27_text_analyze"))
    assert(!p.contains("Exchange"),
      s"per-document analysis must be map-only:\n$p")
  }

  test("multimodal features (q50): payload dropped before output") {
    val df = q("q50_multimodal_features")
    assert(!df.columns.contains("payload"))
  }

  test("maintained top-k (q54): read is a bounded TakeOrderedAndProject, not a full sort") {
    val p = plan(q("q54_ivm_topk_apply"))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k read must plan as per-partition heap + k-row driver merge:\n$p")
  }

  test("maintained dedup signature (q123 level 1): one native pass survives the optimizer") {
    // The whole k=8 signature is ONE MinhashSig expression, staged so the
    // 8 mh columns extract from its attribute. CollapseProject inlining
    // the alias (8 copies of the signature pass per row) or predicate
    // pushdown re-inlining it into a filter would each multiply the
    // dominant per-row cost — pin the shape: exactly one occurrence,
    // never inside a Filter.
    val opt = graft.ivm.Eval.eval(graft.SparkEntry.dedupSigView(spark),
      Fixtures.base(spark, dir)).queryExecution.optimizedPlan.toString
    val sigs = "minhashsig|graft_minhash_sig".r
      .findAllIn(opt.toLowerCase).length
    assert(sigs == 1, s"expected exactly 1 MinhashSig pass, found $sigs:\n$opt")
    val filterLines = opt.split("\n").filter(_.trim.contains("Filter"))
    assert(!filterLines.exists(_.toLowerCase.contains("minhashsig")),
      s"signature pass re-inlined into a filter:\n$opt")
  }

  test("stratified sample (q55 filter): map-only membership, no shuffle, pruned scan") {
    import org.apache.spark.sql.functions._
    val rate = when(col("event_type") === "click", 60).otherwise(25)
    val sampled = graft.ops.Sampling.stratified(
      Fixtures.tbl(spark, dir, "events"), col("event_id"), rate)
      .select("event_id", "event_type")
    val p = plan(sampled)
    assert(!p.contains("Exchange"), s"sampling must be a pure filter:\n$p")
    assert(!p.contains("props"), "sampling must not defeat column pruning")
  }
}
