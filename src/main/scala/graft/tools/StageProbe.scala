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
    // --- capcost: the ×1 cost of hot-bucket suppression on NON-degenerate
    // registry content (r12 verdict #1b). Runs each band-join registry
    // query under all three HotBuckets modes — window (shipped), twophase
    // (the candidate alternative), off (the no-cap floor; NOT a legal
    // registry mode, measurement only) — best-of-2 after a warm-up pass
    // that pins the session fixtures, so the deltas isolate the cap
    // strategy, not fixture materialization. window-vs-off = what the cap
    // costs; twophase-vs-window = what switching would buy.
    if (stageSet == "capcost") {
      val names = args.drop(1) match {
        case rest if rest.nonEmpty => rest.toSeq
        case _ => Seq("dedup_minhash_lsh", "mm_phash_pairs", "mm_video_dedup",
          "mm_audio_dedup", "mm_dedup_eval", "dedup_incremental")
      }
      def run(name: String): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        graft.Caches.release()
        s
      }
      names.foreach { n => run(n); run(n) } // fixture pin + JIT warm-up
      val rows = for (name <- names) yield {
        val per = for (mode <- Seq("window", "twophase", "off")) yield {
          sys.props("graft.capMode") = mode
          val s = math.min(run(name), run(name))
          println(f"[capcost] $name%-28s $mode%-9s $s%7.3f s")
          mode -> s
        }
        sys.props("graft.capMode") = "window"
        val m = per.toMap
        println(f"[capcost] $name%-28s cap overhead vs off ${
          (m("window") / m("off") - 1) * 100}%6.1f%%  twophase vs window ${
          (m("twophase") / m("window") - 1) * 100}%6.1f%%")
        name -> m
      }
      println("[capcost] summary " + rows.map { case (n, m) =>
        f"$n:w=${m("window")}%.3f,t=${m("twophase")}%.3f,o=${m("off")}%.3f"
      }.mkString(" "))
      spark.stop()
      return
    }
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
