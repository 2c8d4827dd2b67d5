package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Registry of persisted intermediates so long-lived sessions can release
  * them once a query materializes. Several stage-frames are deliberately
  * persisted (HOF columns don't codegen, so multi-referenced derivations
  * recompute without a barrier — see NearDup.withSignatures); without a
  * paired unpersist those blocks accumulate in executor storage for the
  * lifetime of the session. Verify/Bench call [[release]] after each query;
  * a spec asserts nothing stays cached.
  */
object Caches {
  private val live = mutable.ArrayBuffer.empty[DataFrame]

  /** persist() + track for later release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    live += df
    df.persist()
  }

  /** Unpersist every tracked frame and clear the registry. */
  def release(): Unit = synchronized {
    live.foreach(_.unpersist())
    live.clear()
  }
}
