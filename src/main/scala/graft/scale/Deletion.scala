package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion propagation (right-to-be-forgotten / licensing takedown)
  * through the persisted admission artifacts: the MinHash signature index
  * ([[NearDup.signatureIndex]]), the SRP vector postings
  * ([[Similarity.vectorPostings]]), the media/video band indexes
  * ([[MediaDedup.bandRows]], [[AviMjpeg.videoBandRows]]), and admitted
  * outputs.
  *
  * Semantics — pinned by DeletionSpec and the `*_delete_propagation`
  * oracles:
  *
  *  - [[purge]] removes EXACTLY the tombstoned ids' own rows. A deleted
  *    doc's independently-admitted near-dups stay: deleting X is not
  *    deleting X's look-alikes (they are their owners' content).
  *  - Admission AFTER a purge sees only surviving content: a new arrival
  *    whose only match was deleted content is ADMITTED — the content is
  *    gone, so it is no longer a duplicate. Equivalently,
  *    purge(index(C), T) ≡ index(C \ T), which is exactly what the
  *    DuckDB oracles replay (index-minus-tombstones + re-probe).
  *  - Previously-emitted verdicts are history, not state: a batch doc
  *    rejected while X lived is not retroactively admitted. Admission is
  *    a pure function of (index, batch); to re-decide, replay the batch
  *    against the purged index.
  *  - A purged index keeps the band GEOMETRY it was built with
  *    ([[Similarity.VectorBandPlan]]): the index owns its plan, and
  *    probes must keep using it — deletions never silently re-plan.
  *
  * Scale shape: tombstone sets are takedown-sized (ids only — thousands
  * to low millions of longs), so [[purge]] plans as a broadcast LEFT ANTI
  * hash join over the index scan. The index side NEVER shuffles: a purge
  * over a 100 TB index is one map-side filtering pass, and with the index
  * stored partitioned (e.g. by batch_id, as [[graft.streaming.StreamingAdmission]]
  * writes it) only the partitions that still contain tombstoned rows need
  * rewriting. The plan shape (anti join via broadcast, zero exchanges on
  * the index side) is pinned in DeletionSpec even with the broadcast
  * threshold disabled.
  */
object Deletion {

  /** `table` minus the rows whose `keyCol` appears in `tombstones` (whose
    * FIRST column is the id column, any name). Ids are deduplicated
    * before the broadcast.
    */
  def purge(table: DataFrame, tombstones: DataFrame, keyCol: String): DataFrame = {
    val t = tombstones
      .select(col(tombstones.columns.head).as("__tombstone_id")).distinct()
    table.join(broadcast(t), col(keyCol) === col("__tombstone_id"), "left_anti")
  }

  /** Physically rewrite a persisted parquet index minus the tombstones
    * into `outDir` (NOT in place — Spark cannot overwrite a path it is
    * reading, and at object-store scale the atomic step should be the
    * caller's directory swap / catalog repoint, not a partial overwrite).
    * Returns (rowsBefore, rowsAfter) so the caller can audit the purge.
    */
  def rewritePurged(spark: SparkSession, indexDir: String, outDir: String,
                    tombstones: DataFrame, keyCol: String): (Long, Long) = {
    val idx = spark.read.parquet(indexDir)
    val purged = purge(idx, tombstones, keyCol)
    purged.write.mode("overwrite").parquet(outDir)
    (idx.count(), spark.read.parquet(outDir).count())
  }
}
