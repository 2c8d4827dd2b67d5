package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection diagnostic: prints formatted physical plans for headline
  * queries so scan pruning (ReadSchema), filter pushdown (PushedFilters),
  * join strategies, and WholeStageCodegen spans can be audited per round.
  * Not part of the driver contract — a dev tool (`sbt "runMain graft.Plans
  * [query...]"`).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q1_pricing", "q3_revenue", "q5_region_revenue",
                         "a4_event_stats", "d1_dedup", "w_tumbling_hourly",
                         "emb_cosine_topk", "rollup_revenue", "emb_ivf_quant",
                         "asof_enrich_ranged", "f13_proto_subject",
                         "corpus_prepare_v4", "a14_lag_trend",
                         "f16_proto_evolution")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.registry(name).build(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
