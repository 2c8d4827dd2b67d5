package graft.streaming

import graft.scale.Similarity
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous EMBEDDING-space corpus growth — the vector twin of
  * [[StreamingAdmission]]: each micro-batch of `(vec_id, embedding)` rows
  * is (1) near-dup'd WITHIN the batch (banded-SRP bucket collision +
  * exact-cosine verify, smaller id survives), (2) admitted against the
  * persisted banded index, and (3) appended — vectors and their index
  * rows — partitioned by batch id with dynamic partition overwrite, so a
  * checkpoint-replayed micro-batch overwrites its own partition instead
  * of double-appending.
  *
  * Same scale posture as the text side: the index directory is the ONLY
  * cross-batch state (no state store — corpus growth bounded by object
  * storage); per-batch cost is O(batch + band-bucket collisions), never
  * O(corpus); candidates are linear because a pair must collide in at
  * least one 2^bitsPerBand-way band to be scored. Band width follows the
  * `Similarity.signBands` recall/precision knobs; `threshold` is the
  * cosine at which a candidate counts as a duplicate.
  */
object StreamingVectorAdmission {

  /** Embedding-space decontamination gate — the vector twin of
    * [[StreamingAdmission.DecontaminationGate]]: an incoming vector whose
    * cosine vs ANY held-out suite embedding reaches `threshold` is
    * semantically leaked eval content and is dropped before dedup and the
    * index. The suite is bounded at any corpus scale, so it collects once
    * per query ([[SemanticGate.forSuite]]) and broadcasts; each
    * micro-batch pays one map-side pass of O(|suite| x dim) per vector —
    * band the suite first if an eval set ever outgrows that.
    */
  final case class SemanticGate(suite: Array[(Seq[Float], Double)],
                                threshold: Double = 0.95) extends Serializable {
    def contaminated(v: Seq[Float]): Boolean = {
      var nv = 0.0
      var i = 0
      while (i < v.length) { nv += v(i).toDouble * v(i).toDouble; i += 1 }
      nv = math.sqrt(nv)
      nv > 0 && suite.exists { case (s, ns) =>
        if (ns == 0) false
        else {
          var dot = 0.0
          var j = 0
          val m = math.min(s.length, v.length)
          while (j < m) { dot += s(j).toDouble * v(j).toDouble; j += 1 }
          dot / (nv * ns) >= threshold
        }
      }
    }
  }
  object SemanticGate {
    def forSuite(bench: DataFrame, vecCol: String = "embedding",
                 threshold: Double = 0.95): SemanticGate = {
      val rows = bench.select(col(vecCol)).collect().map { r =>
        val v = r.getSeq[Float](0)
        (v, math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)))
      }
      SemanticGate(rows, threshold)
    }
  }

  private def withBands(df: DataFrame, bands: Int, bitsPerBand: Int): DataFrame =
    graft.Caches.persist(df
      .select(col("vec_id").as("id"), col("embedding").as("v"),
        Similarity.norm(col("embedding")).as("n"),
        Similarity.signBands(col("embedding"), bands, bitsPerBand).as("bands")))

  private def buckets(df: DataFrame): DataFrame =
    df.select(col("id"), col("v"), col("n"),
      posexplode(col("bands")).as(Seq("band_idx", "bucket")))

  /** Admit one (batch, id) pair — also directly usable for backfill. */
  def admitBatch(batch: DataFrame, batchId: Long, indexDir: String,
                 admittedDir: String, threshold: Double = 0.92,
                 bands: Int = 4, bitsPerBand: Int = 4,
                 gate: Option[SemanticGate] = None): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    graft.functions.Hashing.register(spark)
    // (0) semantic decontamination, when configured: leaked-eval vectors
    // never reach dedup, the index, or the corpus
    val screened = gate.fold(batch) { g =>
      val bc = spark.sparkContext.broadcast(g)
      val isLeak = udf((v: Seq[Float]) => bc.value.contaminated(v))
      batch.filter(!isLeak(col("embedding")))
    }
    if (screened.isEmpty) return
    val b = withBands(screened, bands, bitsPerBand)
    val bx = buckets(b)

    // (1) intra-batch: any-band collision -> exact cosine -> larger id dies
    val intraDropped = bx.as("l").join(bx.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("score",
        Similarity.dot(col("l.v"), col("r.v")) / (col("l.n") * col("r.n")))
      .filter(col("score") >= threshold)
      .select(col("r.id").as("id")).distinct()
    val intraSurvivors = b.join(intraDropped, Seq("id"), "left_anti")

    // (2) cross-batch admission against the index AS OF before this batch
    // (a replayed batch filters out its own and later partitions, so it
    // reproduces its first run's verdicts)
    val index =
      if (graft.io.Fs.exists(spark, indexDir))
        spark.read.parquet(indexDir).filter(col("batch_id") < batchId)
      else buckets(withBands(batch.limit(0), bands, bitsPerBand))
        .withColumn("batch_id", lit(0L))
    val rejected = buckets(intraSurvivors).as("p")
      .join(index.as("c"),
        col("p.band_idx") === col("c.band_idx") && col("p.bucket") === col("c.bucket"))
      .withColumn("score",
        Similarity.dot(col("p.v"), col("c.v")) / (col("p.n") * col("c.n")))
      .filter(col("score") >= threshold)
      .select(col("p.id").as("id")).distinct()
    val admitted = intraSurvivors.join(rejected, Seq("id"), "left_anti")

    // (3) idempotent append: one partition per micro-batch
    buckets(admitted)
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(indexDir)
    admitted.select(col("id").as("vec_id"), col("v").as("embedding"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(admittedDir)
    graft.Caches.release()
  }

  /** Start the continuous admission stream over a `(vec_id, embedding)`
    * source.
    */
  def start(vectors: DataFrame, indexDir: String, admittedDir: String,
            checkpoint: String, threshold: Double = 0.92,
            bands: Int = 4, bitsPerBand: Int = 4,
            gate: Option[SemanticGate] = None): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        admitBatch(batch, id, indexDir, admittedDir, threshold, bands,
          bitsPerBand, gate)
      }
      .start()
}
