package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage wall-clock probe for the staged capstone pipelines (currently
  * `corpus_prepare_v4` via `ScaleQueries.corpusV4Stages`): forces each
  * stage frame through the noop sink IN ORDER, so a stage's time is its
  * own work plus any non-barriered upstream recompute — the same
  * incremental cost a bench run pays. Run twice per invocation: the first
  * pass includes codegen/JIT warmup, the second is the steady state the
  * bench's `min` reports.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.StageProbe'
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageSet = args.headOption.getOrElse("v4")
    (1 to 2).foreach { pass =>
      val t0 = System.nanoTime()
      val stages = stageSet match {
        case "videopair" => graft.queries.ScaleQueries.videoPairStages(spark, sfDir)
        case "audiopair" => graft.queries.ScaleQueries.audioPairStages(spark, sfDir)
        case _           => graft.queries.ScaleQueries.corpusV4Stages(spark, sfDir)
      }
      println(f"[probe] pass$pass BUILD                ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      stages.foreach {
        case (name, df) =>
          val t = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"[probe] pass$pass $name%-20s ${(System.nanoTime() - t) / 1e9}%8.3f s")
      }
      println(f"[probe] pass$pass TOTAL                ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      graft.Caches.release()
    }
    spark.stop()
  }
}
