package graft

import graft.streaming.StreamingAdmission
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class Doc(doc_id: Long, text: String)

/** Streaming admission: cross-batch dedup through the parquet index only,
  * intra-batch dedup via LSH, and replay idempotency via per-batch
  * partition overwrite.
  */
class StreamingAdmissionSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("d").toString

  test("cross-batch near-dups rejected, intra-batch pair keeps smaller id, replay is idempotent") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = tmp("adm-index")
    val admittedDir = tmp("adm-out")

    val a = "the quick brown fox jumps over the lazy dog again and again"
    val c = "entirely novel sentence about glaciers carving fjords in ancient valleys"
    val input = MemoryStream[Doc]
    val q = StreamingAdmission.start(
      input.toDF(), indexDir, admittedDir, tmp("adm-ckpt"))
    try {
      input.addData(Doc(1L, a), Doc(2L, "completely different content with no overlap whatsoever at all"))
      q.processAllAvailable()
      // batch 2: near-dup of doc 1 (cross-batch), fresh doc, and an
      // intra-batch near-dup pair (5, 6)
      input.addData(Doc(4L, a + " today"), Doc(3L, c), Doc(5L, c + " and rivers"), Doc(6L, c + " and rivers too"))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.contains(1L) && admitted.contains(2L))
    assert(!admitted.contains(4L), "cross-batch near-dup must be rejected via the index")
    // intra-batch pair: 5 survives, 6 dies; 3 is near 5 but arrived in the
    // same batch — the intra pass also links 3-5/3-6; smallest id wins
    assert(admitted.contains(3L))
    assert(!admitted.contains(6L))

    // replay idempotency: re-admitting batch 1's docs under the same batch
    // id overwrites its partition — no duplicate index/output rows
    val before = spark.read.parquet(indexDir).count()
    StreamingAdmission.admitBatch(
      Seq(Doc(1L, a), Doc(2L, "completely different content with no overlap whatsoever at all"))
        .toDF(), 0L, indexDir, admittedDir)
    assert(spark.read.parquet(indexDir).count() == before)
    assert(spark.read.parquet(admittedDir)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L).count() == 1)
  }

  test("tombstones take effect on the next batch: near-dup of deleted-only content re-admits") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = tmp("tomb-index")
    val admittedDir = tmp("tomb-out")
    val tombDir = tmp("tomb-ids")

    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "entirely novel sentence about glaciers carving fjords in ancient valleys"
    val input = MemoryStream[Doc]
    val q = StreamingAdmission.start(
      input.toDF(), indexDir, admittedDir, tmp("tomb-ckpt"),
      tombstonesDir = Some(tombDir))
    try {
      input.addData(Doc(1L, a), Doc(2L, b))
      q.processAllAvailable()
      // right-to-be-forgotten for doc 1 lands BETWEEN batches
      Seq(1L).toDF("doc_id").write.parquet(tombDir)
      // batch 2: a near-dup of the deleted doc 1 (must ADMIT — its only
      // match is gone) and a near-dup of the surviving doc 2 (must stay
      // rejected)
      input.addData(Doc(4L, a + " today"), Doc(5L, b + " and rivers"))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.contains(4L),
      s"near-dup of deleted-only content must re-admit, got $admitted")
    assert(!admitted.contains(5L),
      s"near-dup of surviving content must stay rejected, got $admitted")
    // and the admitted doc 4 seeded the index (it is corpus content now)
    val indexed = spark.read.parquet(indexDir)
      .select("doc").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed.contains(4L))
  }

  test("decontamination gate drops leaked eval content before dedup and the index") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = tmp("gate-index")
    val admittedDir = tmp("gate-out")

    val leaked = "held out benchmark question about the capital of france and its rivers"
    val bench = Seq(Doc(900L, leaked)).toDF()
    val gate = StreamingAdmission.DecontaminationGate.forSuite(bench)

    val input = MemoryStream[Doc]
    val q = StreamingAdmission.start(
      input.toDF(), indexDir, admittedDir, tmp("gate-ckpt"), gate = Some(gate))
    try {
      input.addData(
        Doc(1L, leaked), // verbatim suite doc: contaminated, dropped
        Doc(2L, "entirely novel sentence about glaciers carving fjords in ancient valleys"))
      q.processAllAvailable()
    } finally q.stop()

    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(2L), s"expected only the clean doc, got $admitted")
    // the contaminated doc must not have seeded the signature index either
    val indexed = spark.read.parquet(indexDir)
      .select("doc").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(2L), s"index must not contain dropped docs, got $indexed")
  }

  test("rejected sidecar attributes every drop: contaminated / intra-batch / index dup") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val indexDir = tmp("rej-index")
    val admittedDir = tmp("rej-out")
    val rejectedDir = tmp("rej-side")

    val leaked = "held out benchmark question about the capital of france and its rivers"
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val gate = StreamingAdmission.DecontaminationGate
      .forSuite(Seq(Doc(900L, leaked)).toDF())

    val input = MemoryStream[Doc]
    val q = StreamingAdmission.start(
      input.toDF(), indexDir, admittedDir, tmp("rej-ckpt"),
      gate = Some(gate), rejectedDir = Some(rejectedDir))
    try {
      // batch 0: seed the index with doc 1; 2 is a contaminated doc and
      // 3 is 1's intra-batch near-dup
      input.addData(Doc(1L, a), Doc(2L, leaked), Doc(3L, a + " today"))
      q.processAllAvailable()
      // batch 1: doc 4 is a cross-batch near-dup of the INDEXED doc 1
      input.addData(Doc(4L, a + " tomorrow"),
        Doc(5L, "entirely novel sentence about glaciers carving fjords in ancient valleys"))
      q.processAllAvailable()
    } finally q.stop()

    val rej = spark.read.parquet(rejectedDir)
      .select("doc_id", "reason", "batch_id").collect()
      // batch_id comes back as the partition-inferred integer type
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Number](2).longValue)).toSet
    assert(rej == Set((2L, "contaminated", 0L), (3L, "intra_batch_dup", 0L),
      (4L, "index_dup", 1L)), s"got $rej")
    // admitted ∪ rejected = every input doc, disjointly (the audit is total)
    val admitted = spark.read.parquet(admittedDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 5L))
    assert((admitted ++ rej.map(_._1)) == Set(1L, 2L, 3L, 4L, 5L))

    // replaying batch 0 overwrites its sidecar partition - no duplicates
    StreamingAdmission.admitBatch(
      Seq(Doc(1L, a), Doc(2L, leaked), Doc(3L, a + " today")).toDF(),
      0L, indexDir, admittedDir, gate = Some(gate),
      rejectedDir = Some(rejectedDir))
    assert(spark.read.parquet(rejectedDir).count() == 3)
  }
}
