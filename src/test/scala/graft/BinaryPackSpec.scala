package graft

import org.apache.spark.sql.functions._

/** The >64-dim path of the packed-sign-bit binary retrieval
  * (`emb_binary_topk` ships the 64-dim single-word form; its doc claims
  * the general layout is ceil(d/64) words with one bit_count per word).
  * This spec makes the claim executable: at d = 100 the 2-word packed
  * Hamming equals the elementwise sign-disagreement fold on every pair.
  */
class BinaryPackSpec extends SparkSpec {

  test("multi-word packed Hamming == elementwise fold at d=100") {
    // 100-dim vectors from the fixture: 64 real dims + a 36-dim wrap
    val e = graft.sources.Tables.embeddings(spark, sf())
      .filter(col("vec_id") < 20)
      .select(col("vec_id"),
        expr("concat(embedding, slice(embedding, 1, 36))").as("v"))
    // ceil(d/64) words; the short last word zero-fills its missing bits
    // (zip_with pads with null -> IF(null > 0) takes the 0L branch)
    val packed = expr(
      """transform(sequence(0, CAST(ceil(size(v) / 64.0) AS INT) - 1), w ->
        |  aggregate(
        |    zip_with(slice(v, w * 64 + 1, 64), sequence(0, 63),
        |      (x, i) -> IF(x > 0, shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
        |    CAST(0 AS BIGINT), (a, b) -> a ^ b))""".stripMargin)
    val a = e.select(col("vec_id").as("ida"), col("v").as("va"), packed.as("pa"))
    val b = e.select(col("vec_id").as("idb"), col("v").as("vb"), packed.as("pb"))
    val pairs = a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("ham_fold", expr(
        "aggregate(zip_with(va, vb, (x, y) -> IF((x > 0) = (y > 0), 0, 1)), " +
          "0, (acc, d) -> acc + d)"))
      .withColumn("ham_packed", expr(
        "aggregate(zip_with(pa, pb, (x, y) -> bit_count(x ^ y)), " +
          "0, (acc, d) -> acc + d)"))
      .select("ida", "idb", "ham_fold", "ham_packed")
      .collect()
    assert(pairs.length == 190)
    pairs.foreach { r =>
      assert(r.getInt(2) == r.getInt(3),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): fold=${r.getInt(2)} packed=${r.getInt(3)}")
    }
    // sanity: the metric is non-degenerate on this fixture
    assert(pairs.map(_.getInt(2)).distinct.length > 5)
  }
}
