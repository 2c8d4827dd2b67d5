package graft.streaming

import graft.scale.NearDup
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous corpus growth: the streaming form of
  * [[graft.scale.NearDup.admitAgainst]]. Each micro-batch of documents is
  * (1) near-dup'd WITHIN the batch (LSH candidates + signature agreement,
  * smaller id survives), (2) admitted against the persisted signature
  * index, and (3) appended — both the surviving documents and their index
  * rows — partitioned by batch id with dynamic partition overwrite, so a
  * replayed micro-batch overwrites its own partition instead of
  * double-appending (checkpoint-replay idempotency without a transaction
  * log).
  *
  * The index directory is the ONLY cross-batch state: no executor state
  * store, so corpus size is bounded by object storage, not cluster memory
  * — the property that lets a dedup'd corpus grow past any single
  * cluster's state capacity. Per-batch cost is O(batch + bucket
  * collisions), never O(corpus).
  */
object StreamingAdmission {

  /** Optional decontamination gate for the admission stream: docs whose
    * `shingleN`-gram overlap vs the (bounded, pre-collected) benchmark
    * suite reaches `threshold` are leaked eval content and are dropped
    * BEFORE dedup/admission — the streaming form of the v4 capstone's
    * gate. Build once via [[forSuite]] and share across every micro-batch;
    * the probe is one map-side pass per batch
    * (`Contamination.scoreAgainstSet`), no per-batch suite re-scan.
    */
  final case class DecontaminationGate(suite: Set[Long], shingleN: Int = 5,
                                       threshold: Double = 0.5)
      extends Serializable
  object DecontaminationGate {
    def forSuite(bench: DataFrame, shingleN: Int = 5,
                 threshold: Double = 0.5): DecontaminationGate =
      DecontaminationGate(
        graft.scale.Contamination.gramSet(bench, shingleN), shingleN, threshold)
  }

  /** Admit one (batch, id) pair — also directly usable for backfill. */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
                 admittedDir: String, minSigMatches: Int = 6,
                 gate: Option[DecontaminationGate] = None): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return

    // (0) decontamination gate, when configured: contaminated docs never
    // reach dedup, the index, or the corpus
    val cleanBatch = gate.fold(batch) { g =>
      // the probe carries the batch columns through — the clean side is a
      // filter over the scored batch, not an anti-join back against it
      graft.scale.Contamination
        .scoreAgainstSet(g.suite, batch, "doc_id", g.shingleN, g.threshold)
        .filter(!col("contaminated"))
        .select(batch.columns.map(col).toIndexedSeq: _*)
    }
    if (cleanBatch.isEmpty) return
    val sigs = NearDup.withSignatures(cleanBatch)

    // (1) intra-batch near-dups: of any agreeing pair, the smaller id wins
    // (fused band-bucket verify — NearDup.lshDuplicates, equivalence
    // spec-pinned against the candidates + signature-join composition)
    val intraDropped = NearDup.lshDuplicates(sigs, "doc_id", minSigMatches)
    val intraSurvivors = cleanBatch.join(intraDropped, Seq("doc_id"), "left_anti")

    // (2) cross-shard admission against the persisted index AS OF before
    // this batch: a replayed micro-batch filters out its own (and any
    // later) partition, so it sees exactly the index state of its first
    // run and reproduces the same verdicts. Batch ids must be
    // monotonically increasing — Structured Streaming guarantees it.
    val index =
      if (graft.io.Fs.exists(spark, indexDir))
        spark.read.parquet(indexDir).filter(col("batch_id") < batchId)
      else NearDup.signatureIndex(batch.limit(0), "doc_id")
    val verdicts = NearDup.admitAgainst(index, intraSurvivors, "doc_id",
      minSigMatches = minSigMatches)
    val admitted = intraSurvivors.join(
      verdicts.filter(!col("is_dup")).select("doc_id"), Seq("doc_id"), "left_semi")

    // (3) idempotent append: one partition per micro-batch (signatures
    // reused from the stage frame, not recomputed); dynamic overwrite is a
    // per-write option — the shared session's conf is left untouched
    sigs.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("doc"), col("minhash_sig"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(indexDir)
    admitted.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(admittedDir)
    graft.Caches.release()
  }

  /** Start the continuous admission stream over a `(doc_id, text)` source. */
  def start(docs: DataFrame, indexDir: String, admittedDir: String,
            checkpoint: String, minSigMatches: Int = 6,
            gate: Option[DecontaminationGate] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        admitBatch(batch, id, indexDir, admittedDir, minSigMatches, gate)
      }
      .start()
}
