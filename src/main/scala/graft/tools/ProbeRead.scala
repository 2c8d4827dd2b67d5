package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeRead {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val names = Seq("events","lineitem","orders","documents","embeddings","customer","part","supplier","nation","region")
    // warm-up
    names.foreach(n => spark.read.parquet(s"$dir/$n.parquet").schema)
    var t0 = System.nanoTime()
    (1 to 20).foreach(_ => names.foreach(n => spark.read.parquet(s"$dir/$n.parquet").schema))
    println(f"read.parquet build: ${(System.nanoTime()-t0)/1e9/200*1000}%.2f ms per call")
    // memoized relation reuse
    val memo = names.map(n => n -> spark.read.parquet(s"$dir/$n.parquet")).toMap
    t0 = System.nanoTime()
    (1 to 20).foreach(_ => names.foreach(n => memo(n).schema))
    println(f"memoized reuse:     ${(System.nanoTime()-t0)/1e9/200*1000}%.4f ms per call")
    // a simple agg action both ways, events
    import org.apache.spark.sql.functions._
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t = System.nanoTime()
      df.groupBy("event_type").count().write.format("noop").mode("overwrite").save()
      (System.nanoTime()-t)/1e9
    }
    val fresh = (1 to 5).map(_ => run(spark.read.parquet(s"$dir/events.parquet"))).min
    val mem = (1 to 5).map(_ => run(memo("events"))).min
    println(f"agg fresh-read: $fresh%.3f s   agg memoized: $mem%.3f s")
    spark.stop()
  }
}
