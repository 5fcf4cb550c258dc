package org.apache.spark.sql

/** Minimal bridge into Spark's `private[sql]` column internals: resolve a
  * Column's OUTPUT NAME structurally from its ColumnNode (Alias/attribute)
  * instead of string-parsing `Column#toString`, which mis-handles
  * expressions containing a literal " AS ". Lives in the
  * org.apache.spark.sql package solely to see the internal node types; no
  * behavior is patched.
  */
object GraftColumnOps {
  def outputName(c: Column): String = c.node match {
    case a: internal.Alias               => a.name.last
    case u: internal.UnresolvedAttribute => u.nameParts.last
    case _ =>
      // un-aliased computed column: legacy textual form (callers alias
      // computed projections, so this path only names throwaway columns)
      val s = c.toString
      val asIdx = s.lastIndexOf(" AS ")
      if (asIdx >= 0) s.substring(asIdx + 4).stripPrefix("`").stripSuffix("`")
      else s.stripPrefix("`").stripSuffix("`")
  }

  /** Unwrap a `coalesce(1)` put on a LocalRelation-backed frame (the IVM
    * small-batch pins): returns the frame WITHOUT the Repartition node so
    * that pure projections over it constant-fold to a LocalRelation
    * (ConvertToLocalRelation) and collect() driver-side with no Spark job
    * — the Repartition in between otherwise blocks the fold. Identity for
    * any other plan shape. */
  def uncoalesced(df: DataFrame): DataFrame = df.queryExecution.logical match {
    case catalyst.plans.logical.Repartition(1, false, child) =>
      classic.Dataset.ofRows(
        df.sparkSession.asInstanceOf[classic.SparkSession], child)
    case _ => df
  }

  /** True when the frame's optimized plan is already a LocalRelation —
    * the IVM small-batch path then skips collect jobs entirely (its
    * evaluation is a driver-side constant fold). */
  def foldsToLocal(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .isInstanceOf[catalyst.plans.logical.LocalRelation]

  /** Wrap an (unresolved) Catalyst expression as a public Column. Needed
    * where `Expression.sql` does not round-trip through the parser — e.g.
    * window expressions with an unspecified frame print the internal
    * `unspecifiedframe$()` token. The analyzer resolves the expression in
    * whatever plan the Column lands in, exactly as parsed SQL would. */
  def columnOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
