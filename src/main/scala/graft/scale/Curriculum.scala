package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-order scheduling over a prepared corpus: deterministic global
  * shuffle into shards, weight-based epoch repetition, and curriculum
  * (easy→hard) ordering.
  *
  * All order keys are salted mid-square poly-hashes of the document key —
  * the same deterministic gate family as [[Sampling]] — so the "random"
  * training order is reproducible from (salt, key) alone, needs no stored
  * permutation, and never calls a nondeterministic function.
  *
  * 100 TB posture: every op here is one hash per row plus ONE shuffle on
  * the shard/stage key; positions are per-shard `row_number`s (global
  * order is (shard, pos) lexicographically — no single-partition global
  * window anywhere). A writer can feed `partitionBy(shard)` directly.
  */
object Curriculum {

  /** Salted deterministic order key (= [[Sampling.orderHash]]: mid-square
    * mixed poly-hash at full modulus; ties broken by the key downstream).
    */
  private def orderKey(key: org.apache.spark.sql.Column, salt: String) =
    Sampling.orderHash(key, salt)

  /** Deterministic seeded global shuffle into `nShards` training shards:
    * shard = hash % n, pos = rank of the hash within the shard.
    */
  def shuffleShards(df: DataFrame, keyCol: String, salt: String,
                    nShards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("ord"), col(keyCol))
    df.withColumn("ord", orderKey(col(keyCol), salt))
      .withColumn("shard", (col("ord") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Weight-based epoch repetition: each row is emitted `weightCol` times
    * with `epoch` = 1..weight. The expansion is bounded by max(weight) —
    * an explode of a sequence already sized per row, no join.
    */
  def epochRepeat(df: DataFrame, weightCol: String): DataFrame =
    df.withColumn("epoch",
      explode(sequence(lit(1), col(weightCol).cast("int"))))

  /** Curriculum ordering: rows are staged easy→hard by `difficultyCol`
    * quartile, then deterministically shuffled *within* each stage.
    * Quartiles here are exact ntile (the small-SF baseline); at corpus
    * scale the stage boundary comes from approx_percentile thresholds and
    * the rest of the plan is unchanged (same discipline as Behavior.rfm).
    */
  def curriculumOrder(df: DataFrame, keyCol: String, difficultyCol: String,
                      salt: String): DataFrame = {
    val wStage = Window.orderBy(col(difficultyCol), col(keyCol))
    val wPos = Window.partitionBy("stage").orderBy(col("ord"), col(keyCol))
    df.withColumn("stage", ntile(4).over(wStage).cast("int"))
      .withColumn("ord", orderKey(col(keyCol), salt))
      .withColumn("pos", row_number().over(wPos).cast("long"))
  }
}
