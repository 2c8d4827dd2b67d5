package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-equal interval join — the attribution shape: each right event pairs
  * with same-key left events whose timestamp it follows within a horizon
  * (`purchase within 1 h of a click`). One function serves both forms:
  *
  *  - batch frames: a plain equi + range join (oracle-checked, q:w_click_attribution);
  *  - watermarked streaming frames: Spark's stream-stream inner join — the
  *    range condition plus both watermarks lets the state store evict a
  *    buffered row the moment it can never match again, so state is
  *    bounded by (horizon + watermark delay) of traffic per key, not the
  *    stream's history. IntervalJoinSpec pins stream ≡ batch.
  *
  * The equality key shuffles both sides; at 100 TB that is one co-located
  * hash partition per side — the range predicate never fans out beyond the
  * key group.
  */
object IntervalJoin {

  /** Join condition: same key, `right.ts` in `[left.ts, left.ts + horizon]`. */
  def condition(keyCol: String, leftTsCol: String, rightTsCol: String,
                horizonSeconds: Long): Column =
    col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$rightTsCol") >= col(s"l.$leftTsCol") &&
      col(s"r.$rightTsCol") <=
        col(s"l.$leftTsCol") + expr(s"INTERVAL $horizonSeconds SECONDS")

  /** Inner interval join of `left` and `right` on `keyCol` (the only
    * column name the two sides may share).
    */
  def attribute(left: DataFrame, right: DataFrame, keyCol: String,
                leftTsCol: String, rightTsCol: String,
                horizonSeconds: Long): DataFrame =
    left.as("l").join(right.as("r"),
        condition(keyCol, leftTsCol, rightTsCol, horizonSeconds))
      .drop(col(s"r.$keyCol"))
}
