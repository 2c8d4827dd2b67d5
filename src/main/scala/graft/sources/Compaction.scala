package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction for parquet directories — the table-maintenance
  * pass every long-lived 100 TB lake needs: streaming admission, CDC
  * merges and per-batch dynamic overwrites (StreamingAdmission,
  * `cdc_merge`) all emit micro-batch-sized files, and a scan's task count
  * (and the NameNode/object-store listing cost) grows with FILE count,
  * not byte count. Compaction rewrites a fragmented directory into
  * ~`targetBytes` files so `spark.sql.files.maxPartitionBytes` splitting
  * sees a handful of well-sized objects.
  *
  * Scale shape: the LISTING is the only driver-side state (one
  * FileStatus per file — bounded by the file count being repaired); the
  * rewrite itself is one distributed scan + shuffle-free coalesce when
  * shrinking file count, or a round-robin repartition when growing. The
  * FFD bin plan is exposed separately for manifest-level tooling that
  * wants to group WHOLE files (e.g. concatenatable formats or
  * bucket-preserving moves) without a rewrite.
  */
object Compaction {

  /** One planned bin assignment: `path` goes to output bin `bin`. */
  final case class FileBin(path: String, bytes: Long, bin: Int)

  /** First-fit-decreasing bin pack of (path, bytes) into bins of
    * `targetBytes` capacity (a file larger than the target gets its own
    * bin). Deterministic: files sorted by (bytes desc, path).
    */
  def planBins(files: Seq[(String, Long)], targetBytes: Long): Seq[FileBin] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sorted = files.sortBy { case (p, b) => (-b, p) }
    val binFree = scala.collection.mutable.ArrayBuffer.empty[Long]
    sorted.map { case (p, b) =>
      val fit = binFree.indexWhere(_ >= b)
      val bin =
        if (fit >= 0) { binFree(fit) -= b; fit }
        else { binFree += math.max(targetBytes - b, 0L); binFree.length - 1 }
      FileBin(p, b, bin)
    }
  }

  /** List the data files of a parquet directory (driver-side, one
    * FileStatus per file).
    */
  def listDataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
  }

  /** Rewrite `inDir` into `outDir` with ceil(totalBytes/targetBytes)
    * files (at least 1). Shrinking uses `coalesce` — no shuffle, each
    * output task reads whole input splits; growing (rare: a directory of
    * few huge files being split down) uses a round-robin repartition.
    * Returns a 1-row stats frame for the maintenance log.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): DataFrame = {
    val files = listDataFiles(spark, inDir)
    val totalBytes = files.map(_._2).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(inDir)
    val writer = if (nOut <= files.length) df.coalesce(nOut)
                 else df.repartition(nOut)
    writer.write.mode("overwrite").parquet(outDir)
    val outFiles = listDataFiles(spark, outDir)
    import spark.implicits._
    Seq((files.length.toLong, totalBytes, nOut.toLong,
        outFiles.length.toLong, outFiles.map(_._2).sum))
      .toDF("files_before", "bytes_before", "planned_files",
        "files_after", "bytes_after")
  }
}
