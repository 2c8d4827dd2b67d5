package graft

/** Streaming-admission scaling floors (VERDICT r4 #4): per-batch admission
  * cost must stay flat (within generous noise) while the persisted index
  * grows — the measured form of the "O(batch + collisions) per
  * micro-batch" claim. Correctness side: the probe batch is an exact
  * id-shifted copy of batch 0, so EVERY probe doc must be rejected at
  * every index size, and the index must actually grow m-fold (the copies
  * are perturbed precisely so admission doesn't collapse them).
  */
class StreamingScaleSpec extends SparkSpec {

  private lazy val work =
    java.nio.file.Files.createTempDirectory("streamcurve").toString

  test("text admission: probe cost flat x1 -> x5; probe fully rejected; index grows") {
    graft.functions.Hashing.register(spark)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val (t1, rows1) = StreamingCurve.textProbe(spark, docs, s"$work/a", 1)
    val (t5, rows5) = StreamingCurve.textProbe(spark, docs, s"$work/a", 5)
    // the index genuinely grew ~5x (per-copy rotation keeps copies distinct)
    assert(rows5 >= 4 * rows1, s"index did not grow: x1=$rows1 x5=$rows5")
    // every probe doc is an exact dup of its batch-0 twin -> rejected
    val admitted5 = spark.read.parquet(s"$work/a/text_x5/admitted")
      .filter(org.apache.spark.sql.functions.col("batch_id") === 5L).count()
    assert(admitted5 == 0L, s"probe docs admitted: $admitted5")
    // per-batch cost flat within generous noise (fixed overhead dominates
    // at fixture scale; a linear-in-index path would show ~5x here at
    // larger scales and is bounded by the published sf0.1 curve)
    assert(t5 <= 4.0 * t1, f"text probe cost grew x1=$t1%.2fs -> x5=$t5%.2fs")
  }

  test("vector admission: probe cost flat x1 -> x5; probe fully rejected; index grows") {
    graft.functions.Hashing.register(spark)
    val vecs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val (t1, rows1) = StreamingCurve.vecProbe(spark, vecs, s"$work/b", 1)
    val (t5, rows5) = StreamingCurve.vecProbe(spark, vecs, s"$work/b", 5)
    assert(rows5 >= 4 * rows1, s"index did not grow: x1=$rows1 x5=$rows5")
    val admitted5 = spark.read.parquet(s"$work/b/vec_x5/admitted")
      .filter(org.apache.spark.sql.functions.col("batch_id") === 5L).count()
    assert(admitted5 == 0L, s"probe vectors admitted: $admitted5")
    assert(t5 <= 4.0 * t1, f"vector probe cost grew x1=$t1%.2fs -> x5=$t5%.2fs")
  }
}
