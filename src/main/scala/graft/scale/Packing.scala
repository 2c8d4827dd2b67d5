package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget training
  * sequences (the pretraining-loader shape — concatenate docs into
  * budget-sized shards so no compute is wasted on padding). The contiguous
  * greedy rule — docs in a stable order, each starting in the shard where
  * the running token total before it lands — is the one that scales: one
  * window cumsum per group, no bin-state to coordinate, deterministic
  * under retries, and SQL-replayable (first-fit-decreasing packs ~1%
  * tighter but is inherently sequential per bin).
  *
  * 100 TB posture: the window partitions by `groupCol` (source/shard key),
  * so the sort is per-group, shuffle-parallel, and each group's cumsum is
  * one pass. Group skew is the only hazard — feed it a key with bounded
  * group size (e.g. source × date), same rule as any windowed op.
  */
object Packing {

  /** Adds `seq_id`: the 0-based fixed-budget sequence this doc starts in,
    * packing in `orderCol` order within each `groupCol`.
    */
  def packSequences(docs: DataFrame, groupCol: String, orderCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
    docs
      .withColumn("cum_before",
        coalesce(sum(col(tokensCol)).over(w) - col(tokensCol), lit(0L)))
      .withColumn("seq_id",
        floor(col("cum_before").cast("double") / budget.toDouble))
  }

  /** Per-sequence composition: doc count, token total, utilization vs the
    * budget, and the id range packed into the sequence.
    */
  def packSummary(docs: DataFrame, groupCol: String, orderCol: String,
                  tokensCol: String, budget: Long): DataFrame =
    packSequences(docs, groupCol, orderCol, tokensCol, budget)
      .groupBy(col(groupCol), col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("total_tokens"),
        round(sum(col(tokensCol)).cast("double") / budget.toDouble, 6)
          .as("utilization"),
        min(col(orderCol)).as("first_doc"),
        max(col(orderCol)).as("last_doc"))
}
