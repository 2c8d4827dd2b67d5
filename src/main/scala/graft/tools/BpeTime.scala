package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway micro-timer for new registry queries at bench scale. */
object BpeTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Hashing.register(spark)
    for (q <- args; aqe <- Seq("true", "false"); i <- 1 to 3) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t0 = System.nanoTime()
      try graft.SparkEntry.registry(q).build(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      finally graft.Caches.release()
      println(f"[time] $q aqe=$aqe run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
