package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pins the native [[MinhashSig]] expression to the composable
  * higher-order-function pipeline it replaced (which is itself the shape
  * of the q22/q123 DuckDB oracle): identical signatures on real corpus
  * documents and on every edge the split/shingle semantics have. */
class MinhashSigSpec extends AnyFunSuite with SparkTestBase {

  /** The staged HOF reference implementation (pre-native q123 level 1). */
  private def stagedSig(text: Column): Column = {
    val toks = split(text, " ")
    def shingleAt(i: Column): Column =
      concat_ws(" ", get(toks, i), get(toks, i + 1), get(toks, i + 2))
    val kept = org.apache.spark.sql.functions.filter(
      transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
        i => shingleAt(i)),
      sh => size(split(sh, " ")) === 3)
    def mh(sd: Int): Column = array_min(transform(kept, sh =>
      substring(md5(concat(lit((sd / 4).toString), lit("|"), sh)),
        1 + 8 * (sd % 4), 8)))
    when(size(toks) >= 3, array((0 until 8).map(mh): _*))
  }

  test("native signature equals the staged HOF pipeline on real documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val both = docs.select(
      col("doc_id"),
      MinhashSig.of(spark, col("text")).as("native"),
      stagedSig(col("text")).as("staged"))
    val bad = both.where(
      !(col("native") <=> col("staged"))).limit(5).collect()
    assert(bad.isEmpty, s"mismatch on ${bad.mkString("; ")}")
    // and the corpus actually exercises the path
    assert(both.where(col("native").isNotNull).count() > 100)
  }

  test("edge cases: under 3 tokens null, empty tokens kept, exact window") {
    val rows = Seq("", "a", "a b", "a b c", "a  b", "a  b c",
      "x y z w", "a b c d e f g", "über straße äöü eins zwei")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType.fromDDL("text STRING"))
    val both = df.select(
      MinhashSig.of(spark, col("text")).as("native"),
      stagedSig(col("text")).as("staged"))
    both.collect().foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch: $r")
      if (!r.isNullAt(0)) assert(r.getSeq[String](0) == r.getSeq[String](1), r)
    }
  }
}
