package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures what share of an mm_* query's warm time is FIXTURE ENCODE
  * (JPEG/AVI/WAV synthesis of the planted corpus — test-data generation,
  * not the operator under test) vs the operator itself. Times, best-of-2
  * after a warm pass: (a) the fixture media frame alone through the noop
  * sink, (b) the full registered query. (a)/(b) is the ceiling on what
  * pinning the fixture frame could save per warm run.
  */
object MediaFixtureProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.scale._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    import spark.implicits._
    val ids = docs.select(org.apache.spark.sql.functions.col("doc_id")).as[Long]
    def time(df: => org.apache.spark.sql.DataFrame): Double = {
      def once: Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once; math.min(once, once)
    }
    val fixtures: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "jpegPixels(full)" -> (() => Multimodal.mediaJpegPixels(docs).toDF),
      "wavPlanted(x2 arms)" -> (() => AudioDedup.mediaWavPlanted(ids).union(
        AudioDedup.mediaWavPlanted(ids, shift = 500000L, edit = 100,
          stereo = true)).toDF),
      "jpegPhashPairs fixture" -> (() => {
        def wrap(shift: Long, edit: Int)(it: Iterator[Long]) = it.map { id =>
          val (w, h) = Multimodal.pixDims(id)
          Multimodal.MediaRecord(id + shift, "image",
            JpegGray.jpegEncodeGray(w, h,
              Multimodal.plantedBlockPixels(w, h, id, edit)))
        }
        ids.mapPartitions(wrap(0L, 0))
          .union(ids.mapPartitions(wrap(600000L, 24))).toDF
      })
    )
    fixtures.foreach { case (name, mk) =>
      println(f"[mmprobe] fixture $name%-24s ${time(mk())}%7.3f s")
    }
    Seq("mm_jpeg_thumb", "mm_jpeg_phash_pairs", "mm_audio_dedup",
      "mm_resize_thumb", "mm_dedup_eval").foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      println(f"[mmprobe] query   $q%-24s ${time(fn(spark, sfDir))}%7.3f s")
      graft.Caches.release()
    }
    spark.stop()
  }
}
