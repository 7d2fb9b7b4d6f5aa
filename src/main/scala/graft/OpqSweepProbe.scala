package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** OPQ operating-point sweep on the SHIPPED embeddings table (round-10
  * verdict task 5 → round 11): the round-10 sweep ran on a crafted
  * anisotropic set (OPQ's motivating case); this runs the identical
  * persisted rotated-index sweep on `/root/testdata` embeddings so the
  * §4 tuning table also reflects the data shape the bench actually
  * serves. The sf embeddings are near-uniform synthetic vectors —
  * PQ's BEST case — so the honest expectation is rotation ≈ no-op
  * (recall parity, not the strict win the anisotropic set shows);
  * the row exists so a reader tuning against the shipped tables sees
  * measured numbers, not an extrapolated claim.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.OpqSweepProbe"
  */
object OpqSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    // materialized once: the batch probes' auto size guard plus each
    // recall run re-evaluate the query frame's lineage otherwise
    // (autoShuffleRerank's documented caller contract)
    val queries = emb.where($"vec_id" % 100 === 0).localCheckpoint()

    def meanRecall(cb: Similarity.PqCodebook, of: Int): Double = {
      val r = Similarity.pqRecall(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 10, cb = cb, overfetch = of)
        .as[(Long, Long, Double)].collect()
      r.map(_._3).sum / r.length
    }

    // the round-10 sweep's training protocol at the shipped dim=64:
    // m=8 subspaces of 8 dims, 16 codes (the s10/s11 oracle family's
    // configuration class)
    val plain = Similarity.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 8, nCodes = 16, sampleSize = 2048, iters = 10, seed = 42)
    val opq = Similarity.pqTrainCodebook(emb, "vec_id", "embedding",
      m = 8, nCodes = 16, sampleSize = 2048, iters = 10, seed = 42,
      opq = true)

    // persisted rotated index: the rotation must survive the store and
    // the indexed probe must equal the in-memory sweep's codebook path
    val dir = java.nio.file.Files
      .createTempDirectory("graft-opq-sweep").toString
    Similarity.writePqIndex(emb, "vec_id", "embedding", dir, opq)
    val back = Similarity.readPqCodebook(spark, dir)
    require(back.rotation.isDefined, "persisted index lost the rotation")

    val nq = queries.count()
    println(s"[probe-opq] corpus=${emb.count()} queries=$nq dim=64 " +
      "m=8 nCodes=16 (shipped embeddings table)")
    for (of <- Seq(1, 2, 4)) {
      val pr = meanRecall(plain, of)
      val or = meanRecall(opq, of)
      val ir = meanRecall(back, of) // persisted-rotated roundtrip
      println(f"[probe-opq] recall@10 overfetch=$of: plain=$pr%.4f " +
        f"opq=$or%.4f persisted-opq=$ir%.4f")
    }
    spark.stop()
  }
}
