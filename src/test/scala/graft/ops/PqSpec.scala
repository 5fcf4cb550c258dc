package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Product quantization against the brute-force baseline on the embeddings
  * fixture: codes must pack losslessly-decodable into one BIGINT, training
  * must be deterministic, and ADC ranking must keep useful recall while
  * scanning only 8-byte codes. */
class PqSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") < 8)
  private lazy val model = Pq.train(emb, m = 8, k = 64, iters = 3)

  test("training is deterministic; codebook shape is m x k x dim/m") {
    val again = Pq.train(emb, m = 8, k = 64, iters = 3)
    assert(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      again.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(model.m == 8 && model.k == 64 && model.dsub == 8)
  }

  test("codes are one BIGINT with every 8-bit field < k") {
    val codes = Pq.encode(emb, model)
    assert(codes.schema("pq_code").dataType ==
      org.apache.spark.sql.types.LongType)
    val vals = codes.select("pq_code").collect().map(_.getLong(0))
    assert(vals.length == emb.count())
    for (v <- vals; i <- 0 until model.m)
      assert(((v >> (8 * i)) & 255) < model.k, s"code $v sub $i")
    // encoding is a pure function of (vector, codebook): re-encode equal
    val again = Pq.encode(emb, model).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = codes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) = df
    .select(col("q_id").cast("long"), col("n_id").cast("long")).collect()
    .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

  private lazy val bf = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))

  private def recall(m: Map[Long, Set[Long]]) =
    bf.map { case (q, want) => (m(q) & want).size.toDouble / want.size }
      .sum / bf.size

  test("ADC top-k keeps useful recall@5 vs brute force over 8-byte codes") {
    val pq = pairs(Pq.topK(Pq.encode(emb, model), queries, k = 5, model))
    assert(pq.keySet == bf.keySet)
    assert(pq.values.forall(_.size == 5))
    // measured 0.40 with 8x64 on the 64-dim fixture; floor with margin —
    // the bench ann block reports the live value each round
    assert(recall(pq) >= 0.3, s"ADC recall@5 ${recall(pq)}")
  }

  test("exact re-rank of the ADC shortlist recovers high recall") {
    val pq = pairs(Pq.topKRerank(Pq.encode(emb, model), emb, queries,
      k = 5, model)) // default rerank — the asserted quality point
    // the shortlist scan stays on 8-byte codes; only
    // queries x (rerank x k) vectors are ever fetched for exact scoring
    assert(recall(pq) >= 0.9, s"rerank recall@5 ${recall(pq)}")
  }
}
