package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ivm._

/** Dev tool (not driver-run): committed plan evidence for the r09
  * refresh-pipeline optimizations. Dumps the REAL composed delta plan
  * (`ZDelta.delta`) of two representative shapes, so the before/after
  * files pin the join-delta term structure the engine actually executes:
  *
  *   - join_delta: Δ of an orders'⋈lineitem' join with deltas on BOTH
  *     tables — the r09 bilinear form composes 2 join-delta terms
  *     (ΔA⋈(B⊎ΔB) ⊎ A⋈ΔB); the r08 textbook form composed 3
  *     (… ⊎ ΔA⋈ΔB).
  *   - dedup_pairs_delta: Δ of the 4-band LSH self-join union behind
  *     q123/q133's pairs level — 4 bands × 2 terms = 8 joins after,
  *     4 × 3 = 12 before.
  *
  *   sbt "runMain graft.tools.DeltaPlanDump <sfDir> <outDir> <suffix>"
  */
object DeltaPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r09")
    val suffix = args.lift(2).getOrElse("after")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))

    def write(name: String, header: String, df: DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // count join operators once (the formatted detail section's
      // numbered entries), not twice (tree + detail)
      val joins = raw"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
        .findAllIn(plan).size
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        (header + s"\n# join operators in this plan: $joins\n\n" + plan)
          .getBytes("UTF-8"))
      println(s"[dpd] wrote $outDir/${name}_$suffix.txt (joins=$joins)")
    }

    // --- (a) plain join view, deltas on both sides ----------------------
    val view = Join(
      Project(Scan("orders"),
        Seq(col("o_orderkey").as("k"), col("o_orderpriority"))),
      Project(Scan("lineitem"),
        Seq(col("l_orderkey").as("k"), col("l_quantity"))),
      Seq("k"))
    val base = graft.Fixtures.base(spark, sfDir)
    val ds = graft.Fixtures.deltas(spark, sfDir)
    write("join_delta_terms",
      "# Δ(orders' ⋈ lineitem') with deltas on BOTH tables — the composed\n" +
        "# delta plan ZDelta.deltaJoin builds (trace-record off so the\n" +
        "# term structure is the plain composition).\n" +
        "# BEFORE (r08): 3 join-delta terms per join (ΔA⋈B ⊎ A⋈ΔB ⊎ ΔA⋈ΔB).\n" +
        "# AFTER  (r09): 2 terms — bilinear ΔA⋈(B ⊎ ΔB) ⊎ A⋈ΔB; the ΔΔ\n" +
        "# term (and its broadcast build) is folded into the first term's\n" +
        "# union rider.",
      ZDelta.delta(view, ZDelta.Ctx(base, ds,
        p => sys.error(s"no aggregate state expected at $p"))))

    // --- (b) the dedup pairs level's band-join union --------------------
    // the 4-band self-join union behind q123/q133 (distinct top stripped —
    // it only adds the aggregate machinery, not join terms); sig123's base
    // is the materialized signature view, its delta the batch's signature
    // changelog — both synthesized here exactly as Cascade feeds them.
    val sig = Eval.eval(graft.SparkEntry.dedupSigView(spark), base)
    val sigDelta = sig.limit(200).withColumn(IvmCore.MULT, lit(true))
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
    val pairsUnion = (1 until 4).map(bandPairs)
      .foldLeft(bandPairs(0): IvmQuery)(Union(_, _))
    write("dedup_pairs_delta_terms",
      "# Δ of the 4-band LSH self-join union (q123/q133 pairs level,\n" +
        "# distinct top stripped). Each band is a self-join whose BOTH\n" +
        "# sides carry the batch's signature delta.\n" +
        "# BEFORE (r08): 4 bands × 3 terms = 12 join operators.\n" +
        "# AFTER  (r09): 4 bands × 2 terms = 8 — the per-term fixed cost\n" +
        "# (hash build, codegen iterator chain) is the small-batch floor\n" +
        "# of the replayed touched-pin, so term count is the lever.",
      ZDelta.delta(pairsUnion, ZDelta.Ctx(
        { case "sig123" => sig },
        { case "sig123" => Some(sigDelta); case _ => None },
        p => sys.error(s"no aggregate state expected at $p"))))

    spark.stop()
  }
}
