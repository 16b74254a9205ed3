package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {

  /** Deterministic clustered vectors: `n` points around `centers` with
    * small jitter — near-neighbors are intra-cluster by construction. */
  private def clustered(n: Int, dim: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4, dim)(rnd.nextGaussian())
    (0L until n).map { id =>
      val c = centers((id % 4).toInt)
      (id, c.map(v => (v + rnd.nextGaussian() * 0.15).toFloat))
    }
  }

  test("hyperplane buckets: deterministic, non-degenerate, correlated-safe") {
    import spark.implicits._
    val dim = 16
    val df = clustered(200, dim).toDF("id", "vec")
    val b1 = df.select(Similarity.hyperplaneBucket(col("vec"), dim, 6).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val b2 = df.select(Similarity.hyperplaneBucket(col("vec"), dim, 6).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 == b2) // plan-time planes → identical across runs
    assert(b1.distinct.size > 1, "hyperplanes must actually split the space")
    // different seed → different partitioning (overwhelmingly likely)
    val b3 = df.select(
      Similarity.hyperplaneBucket(col("vec"), dim, 6, seed = 99L).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(b1 != b3)
  }

  test("seeded-hyperplane bucketed top-k recall vs brute force") {
    import spark.implicits._
    val dim = 16
    val df = clustered(200, dim).toDF("id", "vec")
    val k = 5
    val exact = Similarity.bruteForceTopK(df, df, "id", "vec", k)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.bucketedTopK(df, df, "id", "vec", k, bits = 4,
      seededDim = Some(dim))
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // 4 bits over 4 tight clusters: intra-cluster neighbors nearly always
    // share all hyperplane signs; demand a solid margin, not perfection
    assert(recall >= 0.7, s"recall $recall")
    // and the candidate set was actually pruned (not one giant bucket)
    val buckets = df.select(
      Similarity.hyperplaneBucket(col("vec"), dim, 4).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.length > 1)
  }
}
