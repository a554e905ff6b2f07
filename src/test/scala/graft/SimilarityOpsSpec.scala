package graft

import graft.ops.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  // 64-dim unit-ish vectors: 0 and 1 nearly parallel, 2 orthogonal-ish
  private def emb = {
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val near = base.clone(); near(0) = near(0) + 0.01f
    val ortho = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    Seq((0L, base.toSeq, 1), (1L, near.toSeq, 1), (2L, ortho.toSeq, 2),
        (3L, base.map(-_).toSeq, 3), (4L, ortho.map(x => (x * 2).toFloat).toSeq, 2))
      .toDF("vec_id", "embedding", "label")
  }

  test("brute-force kNN ranks the nearly-parallel vector first") {
    val top = SimilarityOps.knnBruteForce(emb)
      .filter("q_id = 0 AND rank = 1").select("n_id").as[Long].collect()
    assert(top.head === 1L)
  }

  test("cosine of a scaled copy is 1.0 (scale-invariant)") {
    val cos = SimilarityOps.knnBruteForce(emb)
      .filter("q_id = 2 AND n_id = 4").select("cos").as[Double].collect()
    assert(math.abs(cos.head - 1.0) < 1e-12)
  }

  test("LSH puts identical-direction vectors in the same bucket") {
    val ann = SimilarityOps.annLsh(emb)
    val b2 = ann.filter("q_id = 2").select("n_id").as[Long].collect().toSet
    assert(b2.contains(4L)) // same direction → same hyperplane signs
  }

  test("label centroids: one row per (label, dim), mean of quantized values") {
    val c = SimilarityOps.labelCentroids(emb)
    assert(c.count() === 3 * 64)
    val n = c.filter("label = 1").select("n").distinct().as[Long].collect()
    assert(n.toSeq === Seq(2L))
  }
}
