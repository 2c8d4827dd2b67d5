package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

/** Compaction semantics: content is preserved exactly, the output file
  * count matches the byte-derived plan, and the FFD bin plan respects
  * capacity with the deterministic (bytes desc, path) order.
  */
class CompactionSpec extends SparkSpec {

  test("compact rewrites a fragmented directory to the planned file count, content-exact") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compaction").toString
    // fragment the fixture slice into 40 small files
    val src = graft.sources.Tables.orders(spark, sf())
      .select("o_orderkey", "o_custkey", "o_totalprice")
    src.repartition(40).write.mode("overwrite").parquet(s"$base/frag")
    val before = Compaction.listDataFiles(spark, s"$base/frag")
    assert(before.length == 40)

    val totalBytes = before.map(_._2).sum
    val target = totalBytes / 4 + 1 // plan ~4 output files
    val stats = Compaction.compact(spark, s"$base/frag", s"$base/out", target)
      .collect().head
    assert(stats.getAs[Long]("files_before") == 40L)
    val planned = stats.getAs[Long]("planned_files")
    assert(planned >= 3L && planned <= 5L, s"planned $planned")
    assert(stats.getAs[Long]("files_after") == planned)

    // exact content preservation (multiset equality)
    val a = spark.read.parquet(s"$base/frag")
    val b = spark.read.parquet(s"$base/out")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(a.count() == b.count())
  }

  test("FFD bin plan respects capacity and is deterministic") {
    val files = Seq(("f", 70L), ("a", 40L), ("b", 35L), ("c", 30L),
      ("d", 20L), ("e", 130L))
    val plan = Compaction.planBins(files, targetBytes = 100L)
    // oversized file gets its own bin
    assert(plan.find(_.path == "e").get.bytes == 130L)
    // no bin over capacity except single-file oversized bins
    val perBin = plan.groupBy(_.bin).values
    perBin.foreach { fs =>
      assert(fs.map(_.bytes).sum <= 100L || fs.length == 1,
        s"overfull multi-file bin: $fs")
    }
    // deterministic: same input -> identical plan
    assert(plan == Compaction.planBins(files, 100L))
    // FFD with these sizes packs into 3 bins: [130], [70+30], [40+35+20]
    assert(plan.map(_.bin).distinct.length == 3)
  }
}
