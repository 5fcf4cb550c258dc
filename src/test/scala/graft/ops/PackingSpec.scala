package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Offset packing: the prefix-sum contract, straddling, and determinism. */
class PackingSpec extends AnyFunSuite with SparkTestBase {

  // one bucket, capacity 10: docs of 4, 4, 5, 9, 2 tokens pack to offsets
  // 0, 4, 8 (straddles into example 1), 13, 22
  private def docs = df("doc_id BIGINT, n BIGINT",
    Seq(Row(0L, 4L), Row(16L, 4L), Row(32L, 5L), Row(48L, 9L), Row(64L, 2L)))

  test("assignments are the running prefix sum; straddle starts stay put") {
    val a = Packing.packAssignments(docs, col("doc_id"), col("n"),
      capacity = 10, buckets = 16) // doc_id % 16 == 0 → all in bucket 0
    assertSameRows(a.select("doc_id", "bucket", "example_id", "example_off"),
      df("doc_id BIGINT, bucket BIGINT, example_id BIGINT, example_off BIGINT",
        Seq(Row(0L, 0L, 0L, 0L), Row(16L, 0L, 0L, 4L),
          Row(32L, 0L, 0L, 8L), // starts at 8, straddles into example 1
          Row(48L, 0L, 1L, 3L), Row(64L, 0L, 2L, 2L))))
  }

  test("buckets are independent streams; total tokens conserved") {
    val many = spark.range(0, 200).select(col("id").as("doc_id"),
      (col("id") % 7 + 1).as("n"))
    val a = Packing.packAssignments(many, col("doc_id"), col("n"),
      capacity = 16, buckets = 4)
    assert(a.groupBy("bucket").count().count() == 4)
    // within every bucket, offsets reconstruct the sorted prefix sum
    val bad = a.selectExpr("bucket", "doc_id",
      "example_id * 16 + example_off AS start", "n_tokens")
      .withColumn("expected_start",
        coalesce(sum(col("n_tokens")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("bucket")
            .orderBy("doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .where(col("start") =!= col("expected_start"))
    assert(bad.isEmpty, s"offset drift: ${bad.collect().mkString(",")}")
  }

  test("packStats clips straddling heads at capacity") {
    val st = Packing.packStats(
      Packing.packAssignments(docs, col("doc_id"), col("n"), 10, 16), 10)
    // example 0 holds 4+4 plus the clipped head (2) of the straddler;
    // example 1's doc starts at offset 3 with 9 tokens → 7 fit (2 spill)
    assertSameRows(st.select("example_id", "n_docs", "tokens_used"),
      df("example_id BIGINT, n_docs BIGINT, tokens_used BIGINT",
        Seq(Row(0L, 3L, 10L), Row(1L, 1L, 7L), Row(2L, 1L, 2L))))
  }
}
