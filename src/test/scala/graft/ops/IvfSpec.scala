package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IVF-ANN with learned centroids, measured against the brute-force
  * baseline on the embeddings fixture (the accuracy/cost contract):
  *   - exhaustive probing (nprobe = nCells) must be EXACTLY brute force;
  *   - partial probing must keep useful recall at a fraction of the scan.
  */
class IvfSpec extends AnyFunSuite with SparkTestBase {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.where(col("vec_id") < 8)
  private lazy val model = Ivf.train(emb, k = 16, iters = 3)

  test("training is deterministic and centroids are unit-norm") {
    val again = Ivf.train(emb, k = 16, iters = 3)
    assert(model.centroids.map(_.toSeq).toSeq == again.centroids.map(_.toSeq).toSeq)
    model.centroids.foreach { c =>
      val n = c.map(x => x.toDouble * x).sum
      assert(math.abs(n - 1.0) < 1e-5, s"centroid norm $n")
    }
  }

  test("every corpus vector lands in a valid cell; cells are populated") {
    val cells = Ivf.assign(emb, model).groupBy("ivf_cell").count().collect()
    assert(cells.forall(r => r.getInt(0) >= 0 && r.getInt(0) < model.nCells))
    assert(cells.length > model.nCells / 2,
      s"degenerate clustering: only ${cells.length} non-empty cells")
  }

  test("nprobe = nCells is exactly brute force") {
    val ivf = Ivf.topK(emb, queries, k = 5, model, nprobe = model.nCells)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5)
    assertSameRows(ivf, bf)
  }

  test("cell-partitioned write lets a query read one cell directory") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-cells").toString
    Ivf.assign(emb, model).write.mode("overwrite")
      .partitionBy("ivf_cell").parquet(dir)
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("ivf_cell=")).map(_.getName)
    assert(cellDirs.length > model.nCells / 2, cellDirs.toSeq)
    // reading a single cell dir returns exactly that cell's vectors
    val c0 = cellDirs.head.stripPrefix("ivf_cell=").toInt
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSet
    val one = spark.read.parquet(s"$dir/ivf_cell=$c0")
    val expect = ids(Ivf.assign(emb, model).where(col("ivf_cell") === c0))
    assert(ids(one) == expect)
  }

  test("on-disk index query reads only probed cells and matches in-memory topK") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-index").toString
    Ivf.writeIndex(emb, model, dir)
    for (np <- Seq(4, model.nCells)) {
      val onDisk = Ivf.topKIndexed(dir, queries, k = 5, model, nprobe = np)
      val inMem = Ivf.topK(emb, queries, k = 5, model, nprobe = np)
      assertSameRows(onDisk, inMem)
    }
    // exhaustive probe over the index is still exactly brute force
    assertSameRows(
      Ivf.topKIndexed(dir, queries, k = 5, model, nprobe = model.nCells),
      Similarity.bruteForceTopK(emb, queries, k = 5))
  }

  test("partial probing keeps recall@5 while scanning a fraction of cells") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("q_id").cast("long"), col("n_id").cast("long")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val bf = pairs(Similarity.bruteForceTopK(emb, queries, k = 5))
    val ivf = pairs(Ivf.topK(emb, queries, k = 5, model, nprobe = 4))
    val recalls = bf.map { case (q, truth) =>
      val got = ivf.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"recall@5 at nprobe=4/16: $mean%.2f")
    assert(mean >= 0.5, f"recall@5 collapsed: $mean%.2f")
  }
}
