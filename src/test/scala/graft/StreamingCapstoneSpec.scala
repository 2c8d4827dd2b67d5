package graft

import graft.operators.{Dedup, Envelope}
import graft.scale.NearDup
import graft.streaming.{ConsumePipeline, StreamingAdmission, StreamingStats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Events that carry a document payload — the shape a training-data intake
  * stream has: the event envelope routes/dedups, the document admits.
  */
case class DocEv(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double, props: String,
                 doc_id: Long, text: String)

/** Streaming CAPSTONE (SURVEY §5.3): the full intake chain composed
  * end-to-end over micro-batches —
  *
  *   fixture stream -> envelope -> watermarked event dedup (ConsumePipeline
  *   stage) -> route {processed | DLQ | retry} -> StreamingAdmission
  *   (near-dup dedup + persisted index) ; same stream -> StreamingStats
  *
  * — must converge to the one batch dataflow (the corpus_prepare_v2
  * shape: dedup -> gate -> near-dup -> final table), the way
  * ConsumePipelineSpec pins stream≡batch per-operator. Three micro-batches
  * plus a REPLAYED batch (checkpoint-recovery semantics: the replay must
  * be a no-op, not a double-append).
  */
class StreamingCapstoneSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("d").toString

  private def ev(id: Long, minute: Int, docId: Long, text: String,
                 etype: String = "click"): DocEv =
    DocEv(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), id % 10,
      etype, 1.0, """{"k":1}""", docId, text)

  // distinct base texts (no shared shingles across bases); primed pairs
  // are near-dups under the 8-wide minhash at minSigMatches=6
  private val A = "the quick brown fox jumps over the lazy dog again and again"
  private val B = "entirely novel sentence about glaciers carving fjords in ancient valleys"
  private val C = "completely different content with no overlap whatsoever at all"
  private val D = "orbital mechanics of binary pulsars emit gravitational waves measured nightly"
  private val E = "fermented tea leaves steeped slowly yield complex aromatic flavors"
  private val F = "medieval castle masonry survives centuries of weather erosion intact"
  private val G = "synthesizer arpeggios cascade through reverberant concert halls nightly"

  // batch 1: doc near-dup pair WITHIN the batch (102 vs 103); an invalid
  // event (id 20 -> empty event_id_s) and a failing one (type error ->
  // retry branch) whose documents must never reach admission
  private val b1 = Seq(
    ev(1, 1, 101L, A), ev(2, 2, 102L, B), ev(3, 3, 103L, B + " and rivers"),
    ev(4, 4, 104L, C), ev(20, 5, 120L, "forbidden document on an invalid event"),
    ev(41, 6, 141L, "failing document on an error event", etype = "error"))
  // batch 2: event 2 redelivered (later ts, dedup drops it), a CROSS-batch
  // near-dup of doc 101, two fresh docs
  private val b2 = Seq(
    ev(2, 10, 102L, B), ev(7, 11, 105L, A + " today"),
    ev(8, 12, 106L, D), ev(9, 13, 107L, E))
  // held-out benchmark text: an event carrying it verbatim is valid and
  // processes, but its document is leaked eval content — the
  // decontamination gate must drop it before admission
  private val H = "held out benchmark question about the capital of france and its rivers"

  // batch 3: cross-batch near-dup of doc 106, two fresh docs, and the
  // leaked benchmark doc
  private val b3 = Seq(
    ev(11, 20, 108L, D + " today"), ev(12, 21, 109L, F), ev(13, 22, 110L, G),
    ev(14, 23, 111L, H))

  private val failed = col("event_type") === "error"
  private val cfg = ConsumePipeline.Config(dedupTtl = "2 hours")

  test("composed stream over 3 micro-batches + replay == the batch dataflow") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = tmp("capstone-out")
    val indexDir = tmp("capstone-index")
    val admittedDir = tmp("capstone-admitted")
    val gate = StreamingAdmission.DecontaminationGate.forSuite(
      Seq((900L, H)).toDF("doc_id", "text"))

    // ---- the composed streaming pipeline ----
    val input = MemoryStream[DocEv]
    val deduped = Envelope.withEnvelope(input.toDF())
      .withWatermark(cfg.tsCol, cfg.dedupTtl)
      .dropDuplicatesWithinWatermark(cfg.eventIdCol)
    val q = deduped.writeStream
      .option("checkpointLocation", s"$out/_checkpoint")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val routed = ConsumePipeline.route(batch, cfg, failed)
        routed.processed.write.mode("append").parquet(s"$out/processed")
        routed.dlq.write.mode("append").parquet(s"$out/dlq")
        StreamingAdmission.admitBatch(
          routed.processed.select("doc_id", "text"), id, indexDir, admittedDir,
          gate = Some(gate))
        ()
      }
      .start()
    // the stats leg shares the source and the dedup stage (one DAG, two
    // sinks): tumbling event-time stats over the processed branch
    val stats = StreamingStats.tumblingStats(
        Envelope.withEnvelope(input.toDF())
          .dropDuplicates(cfg.eventIdCol)
          .filter(graft.operators.Validation.isValid(
            col(cfg.eventIdCol), col("props")) && !failed),
        windowDur = "10 minutes", watermarkDelay = "2 hours")
      .writeStream.outputMode("complete")
      .format("memory").queryName("capstone_stats")
      .start()
    try {
      for (b <- Seq(b1, b2, b3)) {
        input.addData(b: _*)
        q.processAllAvailable()
        stats.processAllAvailable()
      }
      // REPLAY b2's micro-batch: a recovered checkpoint re-runs
      // foreachBatch with the SAME batch id — admission must overwrite its
      // own partition, not double-append. The id is read off the admitted
      // partitioning (the stateful dedup stage interleaves no-data
      // batches, so b2's foreachBatch id isn't simply 1).
      val b2BatchId = spark.read.parquet(admittedDir)
        .filter(col("doc_id") === 106L).select("batch_id")
        .head().getInt(0).toLong
      val replayed = ConsumePipeline.route(
        Envelope.withEnvelope(b2.toDF()), cfg, failed).processed
      StreamingAdmission.admitBatch(
        replayed.select("doc_id", "text"), b2BatchId, indexDir, admittedDir,
        gate = Some(gate))
    } finally { q.stop(); stats.stop() }

    // ---- the batch dataflow over the union of all three batches ----
    val batchAll = Envelope.withEnvelope((b1 ++ b2 ++ b3).toDF())
    val batchRouted = ConsumePipeline.route(
      Dedup.keepFirst(batchAll, Seq("event_id"), Seq("ts")), cfg, failed)
    // same decontamination gate as the stream: leaked docs out before dedup
    val batchContaminated = graft.scale.Contamination.scoreAgainstSet(
        gate.suite, batchRouted.processed.select("doc_id", "text"), "doc_id",
        gate.shingleN, gate.threshold)
      .filter(col("contaminated")).select("doc_id")
    val batchDocs = graft.Caches.persist(
      batchRouted.processed.select("doc_id", "text")
        .join(batchContaminated, Seq("doc_id"), "left_anti"))
    // near-dup keep-smallest over the whole processed corpus (the fixture
    // has only pairs, so batch keep-smallest == sequential admission)
    val sigs = NearDup.withSignatures(batchDocs)
    val sigOf = sigs.select(col("doc_id"), col("minhash_sig"))
    val droppedDocs = NearDup.lshCandidates(sigs, "doc_id")
      .join(sigOf.select(col("doc_id").as("doc_a"), col("minhash_sig").as("sig_a")), "doc_a")
      .join(sigOf.select(col("doc_id").as("doc_b"), col("minhash_sig").as("sig_b")), "doc_b")
      .withColumn("m", aggregate(zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v))
      .filter(col("m") >= 6)
      .select(col("doc_b").as("doc_id")).distinct()
    val batchAdmitted = batchDocs.join(droppedDocs, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet

    // ---- stream == batch, stage by stage ----
    val processedIds = spark.read.parquet(s"$out/processed")
      .select("event_id").as[Long].collect().sorted.toSeq
    val batchProcessedIds = batchRouted.processed
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(processedIds == batchProcessedIds,
      s"processed branch diverged: stream=$processedIds batch=$batchProcessedIds")
    assert(processedIds == Seq(1L, 2L, 3L, 4L, 7L, 8L, 9L, 11L, 12L, 13L, 14L))

    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == batchAdmitted,
      s"admitted corpus diverged: stream=$admitted batch=$batchAdmitted")
    // 111 (the leaked benchmark doc) processed as an EVENT but was gated
    // out of the corpus on both paths
    assert(admitted == Set(101L, 102L, 104L, 106L, 107L, 109L, 110L))
    // replay idempotency: doc 106 admitted exactly once despite the rerun
    assert(spark.read.parquet(admittedDir)
      .filter(col("doc_id") === 106L).count() == 1)
    // the rejected docs' index rows were not appended twice either
    assert(spark.read.parquet(indexDir).select("doc").distinct().count() ==
      admitted.size.toLong)

    // ---- stats leg == batch tumbling aggregation ----
    def canon(df: DataFrame) =
      df.select("w_start", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1.getTime, t._2))
    val streamStats = canon(spark.table("capstone_stats"))
    val batchStats = canon(
      Dedup.keepFirst(batchAll, Seq("event_id"), Seq("ts"))
        .filter(graft.operators.Validation.isValid(
          col(cfg.eventIdCol), col("props")) && !failed)
        .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value")))
    assert(streamStats.nonEmpty && streamStats.sameElements(batchStats),
      s"stats diverged:\nstream=${streamStats.toSeq}\nbatch=${batchStats.toSeq}")
    graft.Caches.release()
  }
}
