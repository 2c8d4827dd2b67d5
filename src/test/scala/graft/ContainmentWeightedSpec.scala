package graft

import graft.scale.{NearDup, Sampling}
import org.apache.spark.sql.functions._

/** Semantics of the round-6 additions around asymmetric dedup and
  * weighted draws: containment is directional and catches planted
  * excerpts at ~1.0 where Jaccard sits far below threshold, A-ES
  * sampling is reproducible/weight-monotone, and the rolling median
  * matches a direct computation.
  */
class ContainmentWeightedSpec extends SparkSpec {

  test("containmentPairs: a planted excerpt is contained at ~1.0, not symmetric") {
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    // doc 2 = an exact 12-token excerpt of doc 1 (tokens 5..16); doc 3 unrelated
    val big = (1 to 40).map(i => s"tok$i").mkString(" ")
    val excerpt = (5 to 16).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big, "s"), (2L, excerpt, "s"), (3L, other, "s"))
      .toDF("doc_id", "text", "source")
    val pairs = NearDup.containmentPairs(docs, "doc_id", "source",
        shingleN = 3, threshold = 0.8, maxDf = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((2L, 1L, 1.0)),
      s"only the excerpt is contained (got ${pairs.toSeq}): direction 2->1, " +
        "containment 1.0; the big doc is NOT contained in the excerpt")
  }

  test("weightedSample: reproducible, weight-monotone, and scale-invariant in weights") {
    graft.functions.Hashing.register(spark)
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i, if (i <= 40) 1000.0 else 1.0)).toDF("id", "w")
    def draw(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.weightedSample(df, "id", "w", n = 50, salt = salt)
        .select("id").collect().map(_.getLong(0)).toSet
    val a = draw(rows, "s1")
    assert(a == draw(rows, "s1"), "same salt draws the same sample")
    assert(a != draw(rows, "s2"), "different salt draws a different sample")
    // u^(1/w) is invariant under w -> c*w only in rank terms per row set
    // with the same u draws: scaling all weights by 100 keeps the sample
    val scaled = rows.withColumn("w", col("w") * 100)
    assert(draw(scaled, "s1") == a, "uniform weight scaling keeps the sample")
    // the 10% of rows carrying 1000x weight should dominate the top-50
    val heavyShare = a.count(_ <= 40)
    assert(heavyShare >= 35,
      s"heavy-weight rows must dominate the draw (got $heavyShare/40 of them)")
  }

  test("graft_l2sq_range kernel is bit-identical to the HOF fold on fixture vectors") {
    graft.functions.Hashing.register(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.limit(20)
      .crossJoin(e.limit(20).select(col("vec_id").as("id2"), col("embedding").as("emb2")))
    val checked = pairs.select(
        graft.scale.Quant.l2sq(col("embedding"), col("emb2"), 1, 64).as("k"),
        graft.scale.Quant.l2sqHof(col("embedding"), col("emb2"), 1, 64).as("h"),
        graft.scale.Quant.l2sq(col("embedding"), col("emb2"), 17, 16).as("ks"),
        graft.scale.Quant.l2sqHof(col("embedding"), col("emb2"), 17, 16).as("hs"))
      .collect()
    checked.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "full-range kernel == HOF, bitwise")
      assert(r.getDouble(2) == r.getDouble(3), "subrange kernel == HOF, bitwise")
    }
  }

  test("graft_quantize_i8 kernel is byte-identical to the qscale+quantizeVec HOF chain") {
    graft.functions.Hashing.register(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val both = e.select(
        graft.scale.Quant.quantize(col("embedding")).as("k"),
        graft.scale.Quant.quantizeVec(col("embedding"),
          graft.scale.Quant.qscale(col("embedding"))).as("h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Byte](0) == r.getSeq[Byte](1),
        "fused quantizer == HOF chain, byte for byte")
    }
  }

  test("graft_quantize_i8 null-element semantics match the HOF chain (nulls propagate)") {
    graft.functions.Hashing.register(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .limit(50)
      // poke nulls into scattered components: HOF semantics are scale over
      // the non-null elements (greatest skips nulls), null components out
      .select(col("vec_id"), transform(col("embedding"),
        (x, i) => when(pmod(col("vec_id") + i, lit(7)) === 3,
          lit(null).cast("float")).otherwise(x)).as("embedding"))
    val both = e.select(
        graft.scale.Quant.quantize(col("embedding")).as("k"),
        graft.scale.Quant.quantizeVec(col("embedding"),
          graft.scale.Quant.qscale(col("embedding"))).as("h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val k = r.getSeq[Any](0)
      val h = r.getSeq[Any](1)
      assert(k == h, "fused quantizer == HOF chain on null-bearing arrays")
      assert(k.exists(_ == null), "the fixture actually planted null components")
    }
  }

  test("graft_srp_bands kernel matches the builtin-HOF Rademacher fold exactly") {
    graft.functions.Hashing.register(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    for (plan <- Seq(graft.scale.Similarity.VectorBandPlan(2, 5),
                     graft.scale.Similarity.VectorBandPlan(4, 4),
                     // more planes than dims — the regime the axis-aligned
                     // bands could not reach
                     graft.scale.Similarity.VectorBandPlan(7, 13))) {
      val both = e.select(
          graft.scale.Similarity.srpBandBuckets(col("embedding"), plan).as("k"),
          graft.scale.Similarity.srpBandBucketsHof(col("embedding"), plan).as("h"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[Int](0) == r.getSeq[Int](1),
          s"srp_bands kernel == HOF for $plan")
      }
    }
  }

  test("graft_int_dot_range kernel is bit-identical to the HOF fold on quantized vectors") {
    graft.functions.Hashing.register(spark)
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val q = e.select(col("vec_id"),
      graft.scale.Quant.quantizeVec(col("embedding"),
        graft.scale.Quant.qscale(col("embedding"))).as("q"))
    // the 1 B/element width is the whole point — pin the storage type
    assert(q.schema("q").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.ByteType,
      "quantized vectors must be ARRAY<TINYINT> (1 B/element through the shuffle)")
    val pairs = q.limit(20)
      .crossJoin(q.limit(20).select(col("vec_id").as("id2"), col("q").as("q2")))
    val checked = pairs.select(
        graft.scale.Quant.intDot(col("q"), col("q2")).as("k"),
        graft.scale.Quant.intDotHof(col("q"), col("q2")).as("h"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "int-dot kernel == HOF, exactly")
    }
  }

  test("ts_rolling_median matches a direct frame median on the fixture") {
    val rows = graft.queries.AnalyticsQueries.defs("ts_rolling_median")
      .build(spark, "/root/testdata/sf0.001").collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, series) =>
      val s = series.sortBy(_.getString(1))
      val ns = s.map(_.getLong(2))
      s.zipWithIndex.foreach { case (r, i) =>
        val frame = ns.slice(math.max(0, i - 14), i + 1).sorted
        assert(r.getLong(3) == frame((frame.length + 1) / 2 - 1),
          s"lower median at ${r.getString(1)}")
        assert(r.getInt(4) == frame.length, "win_n is the frame size")
      }
    }
  }
}
