package graft

import graft.scale.Sharding
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Read-side proof of the Z-order layout (VERDICT r3 #7): `shard_zorder`
  * pins key construction; this spec pins what the key is FOR — parquet
  * footer (min/max) pruning under a TWO-column predicate. The same
  * 256x256 uniform grid is written twice, 16 files each: sorted by `a`
  * (the one-column control) and sorted by the Morton key. A file is
  * prunable for a predicate box when its per-column [min, max] envelope
  * misses the box — exactly the decision a lakehouse file pruner (or the
  * parquet reader's row-group filter) makes from footer stats alone.
  *
  * Geometry: z-sorted files are 64x64 tiles, so a box predicate touches
  * the few tiles it overlaps and every other file prunes in BOTH
  * dimensions; a-sorted files span the full `b` range, so `b` never
  * prunes anything. The spec asserts the z layout strictly out-prunes
  * the control — the 100 TB read-path claim, measured on disk.
  */
class ZOrderLayoutSpec extends SparkSpec {

  private val N = 65536 // 256 x 256 grid

  private def grid = {
    import spark.implicits._
    spark.range(N) // `div`, not `/`: Spark's / on longs is double division
      .select((col("id") % 256).as("a"), expr("id div 256").as("b"))
      .withColumn("zkey", Sharding.zOrderKey(col("a"), col("b"), bits = 8))
  }

  /** Write as a single sorted stream split into 4096-row files — each
    * file is one exact contiguous range of the sort key, the layout an
    * OPTIMIZE/compaction job produces.
    */
  private def writeSorted(sortCol: String, dir: String): Unit =
    grid.repartition(1).sortWithinPartitions(col(sortCol))
      .write.option("maxRecordsPerFile", "4096").mode("overwrite").parquet(dir)

  /** Per-file [min, max] of each column, straight from parquet footers. */
  private def fileStats(dir: String): Seq[Map[String, (Long, Long)]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName).toSeq
      .map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = r.getFooter.getBlocks.asScala.toSeq
          Seq("a", "b").map { c =>
            val ss = blocks.map(_.getColumns.asScala
              .find(_.getPath.toDotString == c).get.getStatistics)
            c -> (ss.map(_.genericGetMin.asInstanceOf[Number].longValue).min,
                  ss.map(_.genericGetMax.asInstanceOf[Number].longValue).max)
          }.toMap
        } finally r.close()
      }
  }

  /** Files whose stats envelope misses the box [a1,a2] x [b1,b2]. */
  private def prunable(stats: Seq[Map[String, (Long, Long)]],
                       a1: Long, a2: Long, b1: Long, b2: Long): Int =
    stats.count { s =>
      val (amin, amax) = s("a"); val (bmin, bmax) = s("b")
      amax < a1 || amin > a2 || bmax < b1 || bmin > b2
    }

  test("z-ordered layout strictly out-prunes the one-column sort for a 2-D box") {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val aDir = s"$base/by_a"
    val zDir = s"$base/by_z"
    writeSorted("a", aDir)
    writeSorted("zkey", zDir)

    val aStats = fileStats(aDir)
    val zStats = fileStats(zDir)
    assert(aStats.size == 16 && zStats.size == 16) // 65536 / 4096

    // the 2-D box: a in [0,127], b in [0,31] (1/16 of the grid)
    val aPruned = prunable(aStats, 0, 127, 0, 31)
    val zPruned = prunable(zStats, 0, 127, 0, 31)
    // control: b spans [0,255] in every file -> only `a` prunes (8 of 16)
    assert(aStats.forall(s => s("b") == (0L, 255L)))
    assert(aPruned == 8)
    // z tiles bound BOTH dims: the box touches 2 of 16 tiles -> 14 prune
    assert(zPruned > 0)
    assert(zPruned > aPruned, s"z layout pruned $zPruned, control $aPruned")

    // and the surviving-file read is still correct end to end
    val got = spark.read.parquet(zDir)
      .filter(col("a").between(0, 127) && col("b").between(0, 31))
      .count()
    assert(got == 128L * 32L)
  }

  test("flipping the box to the b dimension keeps the z layout pruning; control cannot") {
    val base = java.nio.file.Files.createTempDirectory("zorder2").toString
    val aDir = s"$base/by_a"
    val zDir = s"$base/by_z"
    writeSorted("a", aDir)
    writeSorted("zkey", zDir)
    // a predicate ONLY on b: the a-sorted control prunes nothing at all
    val aPruned = prunable(fileStats(aDir), 0, 255, 0, 31)
    val zPruned = prunable(fileStats(zDir), 0, 255, 0, 31)
    assert(aPruned == 0)
    assert(zPruned > 0)
  }
}
