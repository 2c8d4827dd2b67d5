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

  /** Context-window chunking: split each document into overlapping
    * `maxTokens`-token chunks advancing by `stride` tokens — the
    * tokenize-and-window step that turns raw documents into model-sized
    * training/indexing units (stride < maxTokens overlaps chunks so no
    * boundary context is lost). Chunk count per doc is
    * 1 + ceil((n - maxTokens)/stride) for n > maxTokens, else 1, so the
    * tail is always covered and output volume is bounded at ~n/stride
    * chunks per doc.
    *
    * Scale shape: a pure per-row explode — no shuffle, no state; the
    * fan-out factor is capped by the doc length over the stride. Output:
    * (id, chunk_idx, n_tokens, chunk_text).
    */
  def chunkByTokens(docs: DataFrame, idCol: String, maxTokens: Int,
                    stride: Int, textCol: String = "text"): DataFrame = {
    require(maxTokens > 0 && stride > 0 && stride <= maxTokens,
      "need 0 < stride <= maxTokens")
    val toks = TextOps.tokens(col(textCol))
    val n = size(toks)
    val nChunks = when(n <= maxTokens, lit(1)).otherwise(
      lit(1) + ceil((n - maxTokens).cast("double") / stride).cast("int"))
    docs
      .select(col(idCol), toks.as("_toks"), n.as("_n"), nChunks.as("_nc"))
      .select(col(idCol), col("_toks"), col("_n"),
        explode(sequence(lit(0), col("_nc") - 1)).as("chunk_idx"))
      .withColumn("_start", col("chunk_idx") * stride)
      .select(
        col(idCol),
        col("chunk_idx").cast("int").as("chunk_idx"),
        (least(col("_start") + maxTokens, col("_n")) - col("_start"))
          .cast("int").as("n_tokens"),
        concat_ws(" ", slice(col("_toks"), col("_start") + 1, lit(maxTokens)))
          .as("chunk_text"))
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
