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

  /** Wrap an (unresolved) Catalyst expression as a public Column. Needed
    * where `Expression.sql` does not round-trip through the parser — e.g.
    * window expressions with an unspecified frame print the internal
    * `unspecifiedframe$()` token. The analyzer resolves the expression in
    * whatever plan the Column lands in, exactly as parsed SQL would. */
  def columnOf(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
