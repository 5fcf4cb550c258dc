package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Connected components over duplicate-pair edges. */
class ClustersSpec extends AnyFunSuite with SparkTestBase {

  private def pairs(es: (Long, Long)*) =
    df("a_id BIGINT, b_id BIGINT", es.map { case (a, b) => Row(a, b) })

  test("chain + separate clique resolve to two components") {
    // chain 1-2-3-4 (diameter 3) and clique {10,11,12}
    val got = Dedup.clusters(pairs(1L -> 2L, 2L -> 3L, 3L -> 4L,
        10L -> 11L, 11L -> 12L, 10L -> 12L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("long chain converges (diameter >> 1) and rep is the component min") {
    val n = 12
    val es = (1 until n).map(i => i.toLong -> (i + 1).toLong)
    val got = Dedup.clusters(pairs(es: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 1L))
  }

  test("edge direction does not matter") {
    val got = Dedup.clusters(pairs(5L -> 2L, 2L -> 9L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }
}
