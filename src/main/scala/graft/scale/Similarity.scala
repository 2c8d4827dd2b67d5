package graft.scale

import graft.functions.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY §7.1 scale/): exact cosine top-k as
  * the correctness baseline, sign-quantized bucketing (an SRP-LSH variant)
  * and KMeans-centroid IVF as the 100 TB paths.
  *
  * Dot products run through the native codegen'd `graft_dot_f` expression
  * (one fused loop) with the same left-fold double-accumulation order as
  * DuckDB's `list_reduce`, so scores compare bit-identical before
  * rounding. Norms are computed once per vector, not per pair.
  *
  * Scale notes: brute force is O(queries x corpus) — fine for a bounded
  * query set against a partitioned corpus (the corpus side stays
  * distributed; queries broadcast). The bucketed variants cut the corpus
  * side by the bucket fan-out, the standard recall/latency trade.
  */
object Similarity {

  /** Elementwise-double dot product, left-fold order (HOF form — kept for
    * parity cross-checks against the native expression).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  /** Native one-pass dot product (requires Hashing.register on the session;
    * every entry point below registers).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot_f", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-quantization bucket over the first `bits` dimensions: bit d set
    * when component d >= 0. A degenerate-but-deterministic random-hyperplane
    * LSH (axis-aligned planes) — the structure, shuffle and join shape are
    * identical to SRP with learned/random planes.
    */
  def signBucket(vec: Column, bits: Int = 4): Column =
    (0 until bits).map { d =>
      when(vec.getItem(d) >= 0f, lit(1 << (bits - 1 - d))).otherwise(lit(0))
    }.reduce(_ + _)

  /** (id, vec, norm) projection — norms computed once per vector. */
  private def withNorm(df: DataFrame, idCol: String, vecCol: String,
                       idAs: String, vecAs: String, normAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
      norm(col(vecCol)).as(normAs))

  /** Exact top-k cosine neighbors for each query row (excluding self).
    * Scores are rounded to 6 decimals before ranking so ordering is
    * reproducible across engines; ties break on neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    Hashing.register(corpus.sparkSession)
    val q = withNorm(queries, idCol, vecCol, "query_id", "qv", "qn")
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "cv", "cn")
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: sign-bucket blocking,
    * thresholded — the vector-space member of the dedup family (candidates
    * linear in corpus, verify only on bucket collisions).
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bits: Int = 4): DataFrame = {
    Hashing.register(corpus.sparkSession)
    val b = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("n"), signBucket(col(vecCol), bits).as("bucket"))
    b.as("l").join(b.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("score",
        round(dot(col("l.v"), col("r.v")) / (col("l.n") * col("r.n")), 6))
      .filter(col("score") >= threshold)
      .select(col("l.id").as("vec_a"), col("r.id").as("vec_b"), col("score"))
  }

  /** IVF-style ANN: KMeans centroids form the inverted file; each query
    * probes only its nearest centroid's list. The mllib fit runs once over
    * the corpus; assignment + probe are plain shuffles. Deterministic for a
    * fixed seed+data but not oracle-reproducible (rows-only check).
    */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nLists: Int, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    Hashing.register(corpus.sparkSession)
    val withFeatures = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(5)
      .fit(withFeatures)
    val assigned = model.transform(withFeatures)
      .select(col("id"), col("v"), norm(col("v")).as("n"),
        col("prediction").as("list_id"))
    val q = assigned.select(col("id").as("query_id"), col("v").as("qv"),
      col("n").as("qn"), col("list_id"))
    val scored = broadcast(q).join(assigned, "list_id")
      .filter(col("query_id") =!= col("id"))
      .withColumn("score", round(dot(col("qv"), col("v")) / (col("qn") * col("n")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("list_id"), col("id").as("neighbor_id"),
        col("score"), col("rank"))
  }

  /** Bucketed top-k: identical shape to brute force, but the cross join is
    * constrained to matching sign buckets — the corpus side is
    * pre-partitioned by bucket, so each query probes ~corpus/2^bits
    * vectors.
    */
  def bucketedTopK(queries: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    Hashing.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), signBucket(col(vecCol), bits).as("bucket"))
    val scored = broadcast(q).join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "neighbor_id", "score", "rank")
  }
}
