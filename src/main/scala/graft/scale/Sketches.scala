package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the path vocabulary statistics take when
  * the key space itself stops fitting in memory (txt_vocab_topk's comment:
  * exact heavy hitters need reduce state per distinct key; a count-min
  * sketch needs width·depth counters total, Cormode & Muthukrishnan 2005).
  *
  * Same discipline as the repo's other sketch queries (hll_distinct_tenants,
  * a8_latency_approx): run the sketch arm NEXT TO the exact arm and surface
  * the realized error, so the trade is measured, not assumed. At 100 TB only
  * the sketch arm ships: one pass, fixed memory, partials merge by counter
  * addition (commutative — AQE can re-plan freely).
  */
object Sketches {

  /** Count-min sketch over a token stream vs exact counts for the top-`k`
    * tokens: (rank, t, n_exact, n_est, within_bound). The sketch is built
    * by Spark's `count_min_sketch` aggregate (deterministic for a fixed
    * seed — counter updates commute), pulled to the driver once (~2/eps ·
    * depth · 8 bytes ≈ 112 KB at eps 1e-3 — a sketch, not data), and
    * probed per candidate token through a per-executor lazily-deserialized
    * holder (same shape as the contamination bloom). CMS guarantees
    * est >= exact always, and est <= exact + eps·N with probability
    * `confidence` per query — `within_bound` surfaces that bound check as
    * data.
    *
    * The estimate column is engine-specific (DuckDB cannot replay Spark's
    * sketch), so the covering query is rows-only by declared discipline;
    * the hard guarantees are spec-pinned instead (SketchesSpec).
    */
  def cmsVocabCheck(docs: DataFrame, eps: Double = 0.001,
                    confidence: Double = 0.99, seed: Int = 42,
                    k: Int = 20): DataFrame = {
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("t"))
    val row = toks.agg(
      expr(s"count_min_sketch(t, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), $seed)").as("s"),
      count(lit(1)).as("n"))
      .head()
    val bytes = row.getAs[Array[Byte]]("s")
    val total = row.getAs[Long]("n")
    val slack = math.ceil(eps * total).toLong
    val holder = new CmsHolder(bytes)
    val est = udf((t: String) => holder.cms.estimateCount(t))
    val exactTop = toks.groupBy("t").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("t")).limit(k)
    exactTop
      .withColumn("n_est", est(col("t")))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_exact").desc, col("t"))).cast("int"))
      .withColumn("within_bound",
        col("n_est") >= col("n_exact") &&
          col("n_est") <= col("n_exact") + lit(slack))
      .select("rank", "t", "n_exact", "n_est", "within_bound")
  }

  private final class CmsHolder(bytes: Array[Byte]) extends Serializable {
    @transient lazy val cms: org.apache.spark.util.sketch.CountMinSketch =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
  }
}
