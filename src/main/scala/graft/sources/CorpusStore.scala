package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Versioned corpus snapshots (round 14 — verdict task 7): the BM25
  * index's generation-pointer idiom (Retrieval.scala `CURRENT`
  * protocol) applied to the corpus ITSELF, so "which exact dataset
  * version did run X train on?" has a first-class answer.
  *
  * Layout under `path`:
  *  - `snapshots/gen=<g>/` — one IMMUTABLE parquet tree per version
  *    (whatever schema the caller's pipeline produces);
  *  - `meta/gen=<g>/` — a 1-row (gen, n_rows) manifest so listing
  *    versions never scans data;
  *  - `CURRENT` — "g" or "g b": the committed generation g and the
  *    oldest RETAINED generation b (b moves only at vacuum time).
  *    Both numbers ride one file so they commit in one atomic rename.
  *
  * The pointer is the commit: a writer materializes everything into
  * generation-private directories no reader ever lists, and the
  * version becomes visible only when the `CURRENT` rename lands.
  * Readers resolve the pointer ONCE (at DataFrame construction) to an
  * explicit `gen=<g>` path, and generation directories are never
  * mutated after commit — so a reader that resolved before a swap
  * keeps reading its version bit-identically while new readers see
  * the new one (concurrent-reader safety across swaps is spec-pinned
  * in CorpusStoreSpec).
  *
  * Cost model at 100 TB: a snapshot write is the full materialization
  * the producing pipeline (recrawl, refilter, dedup pass) was writing
  * ANYWAY — the store adds only the manifest row and the rename;
  * nothing is copied twice. Time-travel retention is then a storage
  * policy, not a compute one: [[vacuumCorpusSnapshots]] trims old
  * generations by moving `base` atomically BEFORE deleting, so a
  * crash mid-vacuum leaves unreachable orphans, never a half-visible
  * version. Between-version review is [[snapshotDelta]] —
  * [[graft.operators.Dedup.snapshotDiff]] over two committed
  * generations: the full-outer exchange carries (id, 8-byte hash),
  * never document text.
  *
  * A read-modify-write cycle (read CURRENT, transform, write next) is
  * safe by construction: the new generation lands in a fresh
  * directory, so the scan of generation g never races its successor's
  * write — the self-overwrite trap of un-versioned corpus paths (read
  * and overwrite of the same parquet tree) structurally cannot
  * happen.
  */
object CorpusStore {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed (gen, base) pair from `CURRENT` (the shared
    * [[GenPointer]] protocol — race-free read, see there); fails fast
    * on a store that was never committed.
    */
  def currentGen(spark: SparkSession, path: String): (Int, Int) = {
    require(GenPointer.exists(spark, path),
      s"CorpusStore: no CURRENT at $path — no committed snapshot")
    GenPointer.read(spark, path)
  }

  private def commitCurrent(spark: SparkSession, path: String,
                            gen: Int, base: Int): Unit =
    GenPointer.commit(spark, path, gen, base)

  /** Commit `df` as the next corpus version and return its generation
    * (0 for a fresh store). The data and manifest land in
    * generation-private directories in OVERWRITE mode — a crashed
    * attempt's orphan is truncated on retry, making the write
    * idempotent — and only then does the atomic CURRENT rename
    * publish the version. The input may itself read the current
    * committed generation (read-modify-write): source and destination
    * directories never coincide.
    */
  def writeCorpusSnapshot(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    import spark.implicits._
    val (gen, base) =
      if (GenPointer.exists(spark, path))
        currentGen(spark, path) match { case (g, b) => (g + 1, b) }
      else (0, 0)
    df.write.mode("overwrite").parquet(s"$path/snapshots/gen=$gen")
    val n = spark.read.parquet(s"$path/snapshots/gen=$gen").count()
    Seq((gen, n)).toDF("gen", "n_rows")
      .repartition(1).write.mode("overwrite").parquet(s"$path/meta/gen=$gen")
    commitCurrent(spark, path, gen, base)
    gen
  }

  /** The committed corpus version — resolves CURRENT once, then reads
    * the explicit generation path (no glob over other generations, so
    * concurrent writers and vacuum orphans are invisible).
    */
  def readCorpusSnapshot(spark: SparkSession, path: String): DataFrame =
    readCorpusSnapshotAt(spark, path, currentGen(spark, path)._1)

  /** Time-travel read of a specific retained generation. Fails fast
    * outside [base, CURRENT] — below base the data was vacuumed,
    * above CURRENT it was never committed (a crashed writer's orphan
    * directory must not be readable as if it were a version).
    */
  def readCorpusSnapshotAt(spark: SparkSession, path: String,
                           gen: Int): DataFrame = {
    val (g, b) = currentGen(spark, path)
    require(gen >= b && gen <= g,
      s"CorpusStore: generation $gen is not retained at $path " +
        s"(committed $g, oldest retained $b)")
    spark.read.parquet(s"$path/snapshots/gen=$gen")
  }

  /** (gen, n_rows) per retained version, from the 1-row manifests —
    * never scans snapshot data.
    */
  def listCorpusSnapshots(spark: SparkSession, path: String): DataFrame = {
    val (g, b) = currentGen(spark, path)
    spark.read
      .parquet((b to g).map(i => s"$path/meta/gen=$i"): _*)
      .orderBy("gen")
  }

  /** Between-version review: [[graft.operators.Dedup.snapshotDiff]]
    * (per id: added / removed / changed / unchanged) from generation
    * `genFrom` to `genTo`. Both must be retained.
    */
  def snapshotDelta(spark: SparkSession, path: String,
                    genFrom: Int, genTo: Int,
                    idCol: String, textCol: String): DataFrame =
    Dedup.snapshotDiff(
      readCorpusSnapshotAt(spark, path, genFrom),
      readCorpusSnapshotAt(spark, path, genTo), idCol, textCol)

  /** Trim time-travel history to the newest `keepLast` generations.
    * Ordering is the crash-safety contract: the new base commits in
    * ONE atomic rename FIRST — from that instant no new reader can
    * resolve a doomed generation — and only then are the directories
    * below it deleted. A crash between the two leaves unreachable
    * orphan directories (readCorpusSnapshotAt refuses gens below
    * base; re-running the vacuum removes them). Readers that resolved
    * a doomed generation BEFORE the vacuum may fail mid-scan — trim
    * retention only past your longest reader, the same contract every
    * table-format vacuum carries.
    */
  def vacuumCorpusSnapshots(spark: SparkSession, path: String,
                            keepLast: Int): Unit = {
    require(keepLast >= 1, "vacuumCorpusSnapshots: keepLast must be >= 1")
    val (g, b) = currentGen(spark, path)
    val newBase = math.max(b, g - keepLast + 1)
    if (newBase != b) commitCurrent(spark, path, g, newBase)
    val f = fs(spark, path)
    (0 until newBase).foreach { i =>
      Seq("snapshots", "meta").foreach { d =>
        val p = new org.apache.hadoop.fs.Path(s"$path/$d/gen=$i")
        if (f.exists(p)) f.delete(p, true)
      }
    }
  }
}
