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

  test("deletion at scale: masked probe flat x1 -> x5, tombstoned twins re-admit, purge accounting exact") {
    graft.functions.Hashing.register(spark)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val (p1, purge1, adm1, before1, after1) =
      StreamingCurve.deletionProbe(spark, docs, s"$work/d", 1)
    val (p5, _, adm5, before5, after5) =
      StreamingCurve.deletionProbe(spark, docs, s"$work/d", 5)
    // tombstoned docs that actually made the index (a batch-0 doc can be
    // dropped intra-batch — then its twin still matches the surviving
    // near-dup and stays rejected); 4 band rows each. Membership is by
    // the tombstone SET, not doc % 15 — re-admitted probe twins also
    // satisfy the residue (the id shift is a multiple of 15) but are not
    // tombstoned
    val indexedTomb1 = spark.read.parquet(s"$work/d/del_x1/index")
      .join(spark.read.parquet(s"$work/d/del_x1/tombstones"),
        org.apache.spark.sql.functions.col("doc") ===
          org.apache.spark.sql.functions.col("doc_id"), "left_semi")
      .select("doc").distinct().count()
    // the probe is an exact copy of batch 0: with batch-0's %15==2 docs
    // tombstoned, twins whose ONLY match was masked re-admit; every other
    // twin stays rejected — and the verdict set is IDENTICAL at both
    // index sizes (index growth adds only non-matching content)
    assert(adm1 > 0, "no tombstoned twin re-admitted — the mask is dead")
    assert(adm1 == adm5, s"re-admit verdicts changed with index size: $adm1 vs $adm5")
    assert(adm1 <= indexedTomb1, s"re-admitted $adm1 > indexed tombstones $indexedTomb1")
    // purge accounting is structural: 4 band rows per INDEXED tombstoned
    // doc, regardless of how large the index has grown
    assert(before1 - after1 == 4 * indexedTomb1,
      s"x1 purged ${before1 - after1} rows, expected ${4 * indexedTomb1}")
    assert(before5 - after5 == 4 * indexedTomb1,
      s"x5 purged ${before5 - after5} rows, expected ${4 * indexedTomb1}")
    assert(before5 >= 4 * before1, s"index did not grow: x1=$before1 x5=$before5")
    // masked per-batch probe cost stays flat (same envelope as the
    // unmasked arms — the mask is a broadcast anti-join on the scan)
    assert(p5 <= 4.0 * p1, f"masked probe cost grew x1=$p1%.2fs -> x5=$p5%.2fs")
    // the purge slope (linear rewrite of survivors, no shuffle) is
    // published in SCALE.md's sf0.1 curve; at fixture scale only the
    // accounting above is stable enough to gate
    assert(purge1 > 0.0)
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

  test("video deletion at scale: masked probe flat x1 -> x5, tombstoned twins re-admit, purge accounting exact") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val (p1, purge1, adm1, before1, after1) =
      StreamingCurve.videoDeletionProbe(spark, docs, s"$work/vd", 1)
    val (p5, _, adm5, before5, after5) =
      StreamingCurve.videoDeletionProbe(spark, docs, s"$work/vd", 5)
    // tombstoned videos that actually made the index; 12 band rows each
    // (4 bands x 3 keyframe positions)
    val indexedTomb1 = spark.read.parquet(s"$work/vd/vdel_x1/index")
      .join(spark.read.parquet(s"$work/vd/vdel_x1/tombstones"),
        org.apache.spark.sql.functions.col("video_id") ===
          org.apache.spark.sql.functions.col("doc_id"), "left_semi")
      .select("video_id").distinct().count()
    assert(adm1 > 0, "no tombstoned twin re-admitted — the mask is dead")
    assert(adm1 == adm5, s"re-admit verdicts changed with index size: $adm1 vs $adm5")
    assert(adm1 <= indexedTomb1, s"re-admitted $adm1 > indexed tombstones $indexedTomb1")
    assert(before1 - after1 == 12 * indexedTomb1,
      s"x1 purged ${before1 - after1} rows, expected ${12 * indexedTomb1}")
    assert(before5 - after5 == 12 * indexedTomb1,
      s"x5 purged ${before5 - after5} rows, expected ${12 * indexedTomb1}")
    // growth over CONTENT batches only — the probe batch re-admits a
    // FIXED number of tombstone twins at every m, which would dilute a
    // total-rows ratio (e.g. (5·63+31)/(63+31) = 3.7× for a perfectly
    // ×5-grown index)
    def contentRows(m: Long): Long = spark.read.parquet(s"$work/vd/vdel_x$m/index")
      .filter(org.apache.spark.sql.functions.col("batch_id") < m).count()
    assert(contentRows(5L) >= 4 * contentRows(1L),
      s"index did not grow: x1=${contentRows(1L)} x5=${contentRows(5L)}")
    assert(p5 <= 4.0 * p1, f"masked video probe cost grew x1=$p1%.2fs -> x5=$p5%.2fs")
    assert(purge1 > 0.0)
  }

  test("audio admission curve fixture: index genuinely grows x5 (envelope clips, ~zero background collisions)") {
    graft.functions.Hashing.register(spark)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text", "source")
    val (a1, rows1) = StreamingCurve.audioProbe(spark, docs, s"$work/au", 1)
    val (a5, rows5) = StreamingCurve.audioProbe(spark, docs, s"$work/au", 5)
    // the r12 arm grew only 4.4x at the x10 label (base-formula background
    // pairs, quadratic in corpus); the envelope fixture must grow x5 at x5
    assert(rows5 >= 4 * rows1 && rows5 <= 6 * rows1,
      s"audio index must grow ~5x: x1=$rows1 x5=$rows5")
    // probe batch = stereo re-encodes of batch 0 -> all rejected
    val admitted5 = spark.read.parquet(s"$work/au/audio_x5/admitted")
      .filter(org.apache.spark.sql.functions.col("batch_id") === 5L).count()
    assert(admitted5 == 0L, s"probe clips admitted: $admitted5")
    assert(a5 <= 4.0 * a1, f"audio probe cost grew x1=$a1%.2fs -> x5=$a5%.2fs")
  }
}
