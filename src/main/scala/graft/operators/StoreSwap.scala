package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-atomic bucket rewrite for the partitioned standing stores
  * ([[Similarity.writeStandingStore]]'s embedding store and
  * [[Dedup.writeSignatureStore]]'s minhash store).
  *
  * The mutation paths (delete-by-id, delete-by-cluster, forget-docs,
  * bucket-local merge, compaction) all rewrite a bounded set of
  * `partCol=b` directories under `$path/data`. Doing that as a dynamic
  * partition overwrite of the path being read has two hazards this
  * helper removes:
  *
  *   1. '''Crash window.''' An overwrite-then-delete sequence that dies
  *      midway resurrects "forgotten" rows or leaves the store half
  *      rewritten — unacceptable for a right-to-be-forgotten API. Here
  *      the rewritten buckets are STAGED under `$path/.staging` (Spark
  *      never lists dot-dirs, so readers can't see them), then a
  *      manifest at `$path/_pending_swap` is renamed into place — the
  *      single commit point — and only then are bucket directories
  *      swapped one rename each. A crash before the manifest leaves the
  *      store byte-identical (the orphan staging dir is inert and
  *      reclaimed on the next mutation); a crash after it is rolled
  *      FORWARD by [[recover]], which every store read/mutation entry
  *      point calls first. Bucket swaps are idempotent, so recovery can
  *      itself crash and re-run.
  *   2. '''Executor-memory pinning.''' The old shape eagerly
  *      `localCheckpoint(true)`-ed the kept slice (Spark refuses a
  *      write that still reads the path it replaces, and the source
  *      files were about to be destroyed). With buckets sized to a few
  *      GB and many touched per batch, that pins the whole slice in
  *      executor memory at the 100 TB design point. The staging write
  *      IS the materialization now — straight to disk, source files
  *      untouched until the swap, nothing pinned.
  *
  * Directory renames are atomic on HDFS-semantics filesystems (HDFS,
  * local, ABFS); on raw S3 they are copy+delete, where a production
  * deployment should put the store behind a table format with a real
  * commit protocol instead. The manifest records which touched buckets
  * survived (staged) vs emptied (no rows left — their live directories
  * must be dropped or deleted rows resurface), so recovery never
  * confuses "already swapped" with "emptied".
  */
object StoreSwap {
  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(path: String) = new Path(path + "/_pending_swap")
  private def staging(path: String) = new Path(path + "/.staging")

  /** Roll forward a swap interrupted after its commit point. Called by
    * the store read and mutation entry points; a no-op (false) when no
    * manifest is pending. */
  def recover(spark: SparkSession, path: String): Boolean = {
    val mf = manifest(path)
    val fs = fsOf(spark, mf)
    if (!fs.exists(mf)) return false
    val in = fs.open(mf)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val lines = body.split("\n", -1)
    val partCol = lines(0)
    def ints(s: String): Seq[Int] =
      if (s.isEmpty) Seq.empty else s.split(",").toSeq.map(_.toInt)
    val dataDir = if (lines.length > 3 && lines(3).nonEmpty) lines(3)
      else "data"
    applySwap(spark, path, partCol, ints(lines(1)), ints(lines(2)), dataDir)
    true
  }

  /** Crash-atomic rewrite of the `touched` buckets of `$path/$dataDir`
    * (default `data`; the PQ code sidecar passes `pq_codes`). `slice`
    * must be the full replacement content for those buckets and carry
    * `partCol`; buckets of `touched` absent from `slice` are emptied
    * (their directories dropped at swap). Returns the staged row count
    * (= rows the touched buckets hold after the swap), read from
    * parquet metadata, so callers can derive deleted-row counts without
    * evaluating `slice` twice. */
  def stagedRewrite(spark: SparkSession, path: String, partCol: String,
                    touched: Seq[Int], slice: DataFrame,
                    sortCols: Seq[Column],
                    dataDir: String = "data"): Long = {
    recover(spark, path) // finish any interrupted predecessor first
    val stg = staging(path)
    val fs = fsOf(spark, stg)
    if (fs.exists(stg)) fs.delete(stg, true) // orphan of a pre-commit crash
    slice
      .repartition(col(partCol))
      .sortWithinPartitions(sortCols: _*)
      .write.partitionBy(partCol).parquet(stg.toString)
    val stagedBuckets = fs.listStatus(stg)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partCol + "="))
      .map(_.getPath.getName.stripPrefix(partCol + "=").toInt).toSet
    // a rewrite that empties EVERY touched bucket stages no data files at
    // all (just _SUCCESS) — parquet can't infer a schema from that, and
    // the answer is simply 0
    val kept = if (stagedBuckets.isEmpty) 0L
      else spark.read.parquet(stg.toString).count() // metadata-only
    val surviving = touched.filter(stagedBuckets)
    val emptied = touched.filterNot(stagedBuckets)
    // commit point: the manifest rename makes the swap durable
    val tmp = new Path(path + "/_pending_swap.tmp")
    val out = fs.create(tmp, true)
    try out.write(
      s"$partCol\n${surviving.mkString(",")}\n${emptied.mkString(",")}\n$dataDir"
        .getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(manifest(path))) fs.delete(manifest(path), false)
    if (!fs.rename(tmp, manifest(path)))
      sys.error(s"could not commit swap manifest under $path")
    applySwap(spark, path, partCol, surviving, emptied, dataDir)
    kept
  }

  /** The post-commit half: swap surviving buckets in (one atomic rename
    * each), drop emptied buckets' live directories, then clear the
    * manifest and staging remnants. Idempotent — re-runnable after a
    * crash at any point. */
  private def applySwap(spark: SparkSession, path: String, partCol: String,
                        surviving: Seq[Int], emptied: Seq[Int],
                        dataDir: String): Unit = {
    val stg = staging(path)
    val fs = fsOf(spark, stg)
    surviving.foreach { b =>
      val src = new Path(s"$path/.staging/$partCol=$b")
      val dst = new Path(s"$path/$dataDir/$partCol=$b")
      if (fs.exists(src)) { // absent = this bucket already swapped
        if (fs.exists(dst)) fs.delete(dst, true)
        if (!fs.rename(src, dst)) sys.error(s"bucket swap failed: $dst")
      }
    }
    emptied.foreach { b =>
      val dst = new Path(s"$path/$dataDir/$partCol=$b")
      if (fs.exists(dst)) fs.delete(dst, true)
    }
    fs.delete(manifest(path), false)
    if (fs.exists(stg)) fs.delete(stg, true)
  }
}
