package graft.scale

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Balanced ordered sharding: assign rows to `nShards` contiguous key
  * ranges of ~equal row count — the write-path layout step for ordered
  * storage (sorted parquet shards, ordered training-data files). This is
  * what `repartitionByRange` does internally, made explicit and
  * deterministic: boundaries at the k/n quantiles, shard id = number of
  * boundaries strictly below the key, so the assignment is a pure function
  * of (key, boundary list) and replays identically anywhere — including
  * in the DuckDB oracle.
  *
  * Scale: the boundary aggregation is one pass (exact `percentile` here —
  * sort-based; at 100 TB swap in `approx_percentile`, which is the same
  * sampled estimate `repartitionByRange` uses, and accept ±ε balance).
  * Assignment broadcasts n-1 doubles and folds one comparison per
  * boundary per row — no shuffle at all until the caller actually
  * repartitions/writes by `shard_id`.
  */
object Sharding {

  /** Adds `shard_id` in [0, nShards): contiguous in `keyCol` order,
    * ~equal-count (ties share a shard — a tied key never splits).
    */
  def rangeShards(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards > 1, "need at least 2 shards")
    val probs = (1 until nShards).map(_.toDouble / nShards)
    val bounds = df.agg(
      expr(s"percentile($keyCol, array(${probs.mkString(", ")}))").as("_bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("shard_id",
        aggregate(col("_bounds"), lit(0),
          (acc, b) => acc + when(col(keyCol) > b, 1).otherwise(0)))
      .drop("_bounds")
  }

  /** Z-order (Morton) key over two non-negative integer dimensions: bit i
    * of `a` lands at position 2i+1, bit i of `b` at 2i, for `bits` bits
    * each — the multi-dimensional clustering key. Sorting/range-sharding
    * by the z-key gives every shard a BOUNDED RANGE IN BOTH dimensions at
    * once, which is what makes min/max (parquet footer) pruning work for
    * two-column predicates on data at rest: a one-column sort prunes one
    * dimension perfectly and the other not at all; z-order splits the
    * pruning power across both (the classic lakehouse OPTIMIZE ZORDER
    * layout, from the public Morton-code construction).
    *
    * Pure bit arithmetic on longs — the disjoint bit positions sum, so
    * the same expression replays in the DuckDB oracle; inputs are taken
    * mod 2^bits so callers can feed raw keys.
    */
  def zOrderKey(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
                bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val am = pmod(a.cast("long"), lit(1L << bits))
    val bm = pmod(b.cast("long"), lit(1L << bits))
    (0 until bits).map { i =>
      (shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i + 1)
        + shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i)): org.apache.spark.sql.Column
    }.reduce(_ + _)
  }

  /** The DuckDB-dialect mirror of [[zOrderKey]], generated from the same
    * bit positions so the two sides cannot drift.
    */
  def zOrderKeySql(a: String, b: String, bits: Int = 16): String = {
    val m = 1L << bits
    (0 until bits).map { i =>
      s"((((CAST($a AS BIGINT) % $m + $m) % $m >> $i) & 1) << ${2 * i + 1})" +
        s" + ((((CAST($b AS BIGINT) % $m + $m) % $m >> $i) & 1) << ${2 * i})"
    }.mkString("(", " + ", ")")
  }

  /** [[rangeShards]] with sampled boundaries: `approx_percentile`
    * (KLL/GK-style mergeable sketch, `accuracy` controls rank error
    * ε ≈ 1/accuracy) instead of the exact sort-based `percentile`. This is
    * the 100 TB form — the boundary pass becomes a single-scan mergeable
    * aggregation with bounded memory, the same estimate
    * `repartitionByRange` samples for — at the cost of shard counts
    * balanced to ±ε·N instead of exactly. Assignment is unchanged: a pure
    * broadcast of n-1 boundary doubles, no shuffle. The sketch boundary is
    * engine-specific, so this variant is spec-checked for balance
    * tolerance (ShardingSpec), not DuckDB-hash-checked like the exact one.
    */
  def rangeShardsApprox(df: DataFrame, keyCol: String, nShards: Int,
                        accuracy: Int = 10000): DataFrame = {
    require(nShards > 1, "need at least 2 shards")
    val probs = (1 until nShards).map(_.toDouble / nShards)
    val bounds = df.agg(
      expr(s"approx_percentile($keyCol, array(${probs.mkString(", ")}), $accuracy)")
        .as("_bounds"))
    df.crossJoin(broadcast(bounds))
      .withColumn("shard_id",
        aggregate(col("_bounds"), lit(0),
          (acc, b) => acc + when(col(keyCol) > b, 1).otherwise(0)))
      .drop("_bounds")
  }

  /** Per-shard balance report: row count and key range per shard. */
  def shardSummary(df: DataFrame, keyCol: String, nShards: Int): DataFrame =
    rangeShards(df, keyCol, nShards)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"))
}
