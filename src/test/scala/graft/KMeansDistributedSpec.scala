package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexHealth, Similarity}

/** Distributed Lloyd vs the bounded-sample driver Lloyd (round 14):
  * same k-means++ seeding, so on a corpus the sample COVERS the two
  * fits agree (parity), and on a corpus the sample cap CANNOT cover
  * the distributed rounds weight centroids by true corpus mass where
  * the sampled fit's geometry skews the cells (the 100× bar: sample
  * caps distort cell balance under fine-grained structure).
  */
class KMeansDistributedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Deterministic synthetic corpus: `perCluster` jittered copies of
    * each of `nClusters` near-orthogonal unit directions in 16 dims.
    */
  private def clustered(nClusters: Int, perCluster: Int,
                        jitter: Double): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(7L)
    val dim = 16
    (0 until nClusters).flatMap { c =>
      (0 until perCluster).map { i =>
        val v = Array.tabulate(dim) { d =>
          (if (d == c) 1.0 else 0.0) + jitter * rnd.nextGaussian()
        }
        val n = math.sqrt(v.map(x => x * x).sum)
        ((c.toLong * perCluster + i),
          v.map(x => (x / n).toFloat).toSeq)
      }
    }
  }

  test("parity: when the sample covers the corpus, distributed Lloyd equals driver Lloyd") {
    val df = clustered(4, 15, 0.05).toDF("vec_id", "embedding")
      .localCheckpoint()
    val dirS = tmp("graft-km-s")
    val dirD = tmp("graft-km-d")
    // sampleSize ≥ corpus: both strategies see every vector; the only
    // remaining difference is WHO sums (driver doubles vs distributed
    // exact decimals) — the fits must agree to fp tolerance and the
    // induced cell assignment must be identical
    Similarity.writeIvfIndex(df, "vec_id", "embedding", dirS,
      nCells = 4, strategy = Similarity.KMeansCentroids(
        sampleSize = 100, iters = 15, seed = 42L))
    Similarity.writeIvfIndex(df, "vec_id", "embedding", dirD,
      nCells = 4, strategy = Similarity.KMeansCentroidsDistributed(
        sampleSize = 100, iters = 15, seed = 42L))
    val cs = spark.read.parquet(s"$dirS/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](0).toArray)
    val cd = spark.read.parquet(s"$dirD/centroids").orderBy("cell")
      .collect().map(_.getSeq[Double](0).toArray)
    assert(cs.length == cd.length)
    cs.zip(cd).zipWithIndex.foreach { case ((a, b), c) =>
      a.zip(b).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9,
          s"centroid $c drifted: ${a.toSeq} vs ${b.toSeq}")
      }
    }
    assertSameRows(
      spark.read.parquet(s"$dirS/cells").select("id", "cell"),
      spark.read.parquet(s"$dirD/cells").select("id", "cell"))
  }

  /** Deterministic duplicate-heavy corpus (the 100 TB norm): 6
    * exact-duplicate stacks of 500 plus `nBackground` distinct
    * gaussian unit vectors, 16-dim.
    */
  private def duplicated(nBackground: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(11L)
    val stacks = (0 until 6).flatMap { c =>
      val v = Array.tabulate(16)(d => if (d == c) 1.0f else 0.0f).toSeq
      (0 until 500).map(i => ((c * 500 + i).toLong, v))
    }
    val bg = (0 until nBackground).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      ((3000 + i).toLong, v.map(x => (x / n).toFloat).toSeq)
    }
    stacks ++ bg
  }

  test("skew: a bounded sample with fewer distinct locations than nCells trips needsRebuild; the distributed fit re-seeds and does not") {
    // the duplicate-heavy shape: the 16-point sample lands mostly on
    // the 6 exact-duplicate stacks, so k-means++ runs out of distance
    // mass and stacks COINCIDENT centroids whose tie-broken twins
    // stay empty forever — over half the cells empty trips
    // needsRebuild, and no amount of driver Lloyd can fix it (the
    // sample has no more distinct geometry). The distributed rounds
    // re-seed empties at the corpus's worst-covered distinct vectors.
    val df = duplicated(40).toDF("vec_id", "embedding")
      .localCheckpoint()
    val dirS = tmp("graft-km-skew-s")
    val dirD = tmp("graft-km-skew-d")
    Similarity.writeIvfIndex(df, "vec_id", "embedding", dirS,
      nCells = 16, strategy = Similarity.KMeansCentroids(
        sampleSize = 16, iters = 20, seed = 42L))
    Similarity.writeIvfIndex(df, "vec_id", "embedding", dirD,
      nCells = 16, strategy = Similarity.KMeansCentroidsDistributed(
        sampleSize = 16, iters = 10, seed = 42L))
    val hs = IndexHealth.report(spark, dirS)
    val hd = IndexHealth.report(spark, dirD)
    assert(hs.needsRebuild && hs.emptyPartitions > 8,
      s"sample-trained fit unexpectedly healthy: $hs")
    assert(!hd.needsRebuild,
      s"distributed fit did not re-seed its empty cells: $hd")
    assert(hd.emptyPartitions < hs.emptyPartitions,
      s"distributed empties ${hd.emptyPartitions} not below sampled " +
        s"${hs.emptyPartitions}")
  }
}
