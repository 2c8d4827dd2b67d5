package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Invariants of the round-6 analytics queries, checked on sf0.001 (small
  * enough to cross-compute references on the driver) plus constructed
  * cases: EWMA matches the recursive definition bit-for-bit, gap-fill is
  * exactly LOCF over a complete grid, chunk dedup keeps globally-first
  * occurrences only, and the frame functions respect their frames.
  */
class AnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) =
    AnalyticsQueries.defs(name).build(spark, dir)

  test("ts_ewma equals the recursive EWMA over the trailing-30 frame") {
    val rows = run("ts_ewma").collect()
    val byType = rows.groupBy(_.getString(0)).view.mapValues(_.sortBy(_.getString(1)))
    byType.foreach { case (_, series) =>
      val xs = series.map(_.getDouble(2))
      series.zipWithIndex.foreach { case (r, i) =>
        val frame = xs.slice(math.max(0, i - 29), i + 1)
        val expected = frame.tail.foldLeft(frame.head)((acc, x) => 0.2d * x + 0.8d * acc)
        assert(r.getDouble(3) == math.rint(expected * 1e4) / 1e4 ||
          math.abs(r.getDouble(3) - expected) < 1e-4,
          s"ewma at ${r.getString(1)}: got ${r.getDouble(3)}, want ~$expected")
      }
    }
  }

  test("ts_gap_fill: complete grid, LOCF semantics, gap flags consistent") {
    val rows = run("ts_gap_fill").collect()
    val byType = rows.groupBy(_.getString(0))
    val expectedHours = byType.values.map(_.length).toSet
    assert(expectedHours.size == 1, "every type spans the same global hour grid")
    byType.foreach { case (_, series) =>
      var lastSeen: Option[Long] = None
      series.sortBy(_.getString(1)).foreach { r =>
        val raw = if (r.isNullAt(2)) None else Some(r.getLong(2))
        val filled = if (r.isNullAt(3)) None else Some(r.getLong(3))
        assert(r.getBoolean(4) == raw.isEmpty, "is_gap must mirror a missing raw count")
        if (raw.isDefined) lastSeen = raw
        assert(filled == lastSeen, s"filled=${filled} must be last observed=${lastSeen}")
      }
    }
  }

  test("dedup_chunks: kept counts bound by totals and sum to distinct chunks") {
    val out = run("dedup_chunks")
    val agg = out.agg(sum("n_chunks"), sum("n_kept")).collect()(0)
    val docs = graft.sources.Tables.documents(spark, dir)
    // distinct chunk count, computed independently with the same chunking
    val toks = graft.scale.TextOps.tokens(col("text"))
    val nDistinct = docs
      .select(col("doc_id"), toks.as("toks"))
      .withColumn("nc", ceil(size(col("toks")) / lit(32.0)).cast("int"))
      .select(explode(expr(
        "transform(sequence(0, nc - 1), i -> array_join(slice(toks, i * 32 + 1, 32), ' '))")).as("chunk"))
      .distinct().count()
    assert(agg.getLong(1) == nDistinct,
      "sum of kept chunks equals the number of distinct chunks in the corpus")
    out.collect().foreach { r =>
      assert(r.getInt(2) <= r.getInt(1), "n_kept <= n_chunks per doc")
    }
  }

  test("dedup_chunks: the lexicographically-first doc keeps every chunk it introduces") {
    val firstDoc = run("dedup_chunks").orderBy("doc_id").limit(1).collect()(0)
    assert(firstDoc.getInt(2) >= 1, "doc 0 keeps at least its first chunk")
  }

  test("w_frame_funcs: rank bounds and frame endpoints") {
    val rows = run("w_frame_funcs").collect()
    rows.groupBy(_.getAs[Number](0).longValue).foreach { case (_, orders) =>
      val sorted = orders.sortBy(_.getAs[Number](3).longValue)
      val first = sorted.head.getDouble(6)
      val last = sorted.head.getDouble(7)
      sorted.foreach { r =>
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0, "percent_rank in [0,1]")
        assert(r.getDouble(5) > 0.0 && r.getDouble(5) <= 1.0, "cume_dist in (0,1]")
        assert(r.getDouble(6) == first && r.getDouble(7) == last,
          "first/last over the full frame are constant within the partition")
      }
      assert(sorted.head.getDouble(6) == sorted.head.getDouble(2),
        "first_price is the first row's price")
      assert(sorted.last.getDouble(7) == sorted.last.getDouble(2),
        "last_price is the last row's price")
      if (sorted.length == 1)
        assert(sorted.head.isNullAt(8), "nth_value(2) is null for singleton partitions")
      else
        assert(sorted.forall(r => r.getDouble(8) == sorted(1).getDouble(2)),
          "second_price is the 2nd row's price everywhere in the partition")
    }
  }

  test("graft_phrase_positions kernel equals the HOF position filter") {
    graft.functions.Hashing.register(spark)
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val kernel = docs.select(col("doc_id"),
        call_function("graft_phrase_positions", col("text"), lit("value table")).as("pos"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    val hof = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .selectExpr("doc_id",
        """filter(sequence(1, greatest(size(toks) - 1, 1)),
          |  i -> element_at(toks, i) = 'value'
          |   AND element_at(toks, i + 1) = 'table') AS pos""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    assert(kernel == hof, "native kernel and HOF form must agree on every doc")
    assert(kernel.values.exists(_.nonEmpty), "the fixture phrase must occur")
    // overlapping matches: 'a a a' searching 'a a' -> positions 1 and 2
    import spark.implicits._
    val tri = Seq((1L, "a a a")).toDF("doc_id", "text")
      .select(call_function("graft_phrase_positions", col("text"), lit("a a")))
      .collect()(0).getSeq[Int](0).toList
    assert(tri == List(1, 2), "overlapping matches are all reported")
  }

  test("txt_bigram_lm: perplexity is exp(-avg_logprob) and bigram counts line up") {
    val rows = run("txt_bigram_lm").collect()
    rows.foreach { r =>
      val ppl = math.exp(-r.getDouble(2))
      assert(math.abs(r.getDouble(3) - ppl) < math.max(1e-3, ppl * 1e-3),
        s"ppl ${r.getDouble(3)} vs exp(-avg_lp) $ppl")
      assert(r.getLong(1) >= 1, "every doc has at least one bigram")
    }
    val nTok = graft.sources.Tables.documents(spark, dir)
      .select(sum(size(graft.scale.TextOps.tokens(col("text"))) - 1)).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == nTok,
      "total bigrams = total tokens minus one per doc")
  }
}
