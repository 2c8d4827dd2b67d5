package graft

import graft.scale.Sharding
import org.apache.spark.sql.functions._

/** scale/Sharding — balanced ordered shards. */
class ShardingSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("shards are contiguous in key order and roughly balanced") {
    val s = Sharding.shardSummary(docs, "n_chars", nShards = 4)
      .orderBy("shard_id").collect()
    assert(s.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    // contiguity: each shard's max key <= next shard's min key
    s.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2),
        s"shard ${a.getInt(0)} max ${a.getLong(3)} > shard ${b.getInt(0)} min ${b.getLong(2)}")
    }
    // balance: no shard more than 2x the ideal (ties can pile into one)
    val n = docs.count()
    s.foreach(r => assert(r.getLong(1) <= 2 * n / 4 + 1,
      s"shard ${r.getInt(0)} holds ${r.getLong(1)} of $n rows"))
  }

  test("repartition-by-shard + sortWithinPartitions yields a global order") {
    val sharded = Sharding.rangeShards(docs, "n_chars", nShards = 4)
      .repartition(4, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("n_chars"))
    // reading back in (shard_id, position) order must be globally sorted —
    // the ordered-storage write path this operator exists for
    val keys = sharded.select(col("shard_id"), col("n_chars"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)  // stable: preserves within-partition order per shard
    val chars = keys.map(_._2)
    assert(chars.sameElements(chars.sorted), "keys not globally ordered")
  }

  test("approx boundaries: contiguous, complete, balanced within tolerance") {
    val n = docs.count()
    val tagged = Sharding.rangeShardsApprox(docs, "n_chars", nShards = 4)
    assert(tagged.count() == n)
    val s = tagged.groupBy("shard_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("n_chars")).as("min_key"), max(col("n_chars")).as("max_key"))
      .orderBy("shard_id").collect()
    assert(s.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    s.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2))
    }
    // sketch accuracy 10000 → rank error ~1e-4·N; allow the same 2x-ideal
    // slack as the exact form plus the epsilon
    s.foreach(r => assert(r.getLong(1) <= 2 * n / 4 + n / 1000 + 1,
      s"shard ${r.getInt(0)} holds ${r.getLong(1)} of $n rows"))
  }

  test("every row lands in exactly one shard; ids cover [0, n)") {
    val tagged = Sharding.rangeShards(docs, "n_chars", nShards = 8)
    assert(tagged.count() == docs.count())
    val ids = tagged.select("shard_id").distinct().as[Int].collect().sorted
    assert(ids.head >= 0 && ids.last < 8)
  }

  test("zOrderKey: Morton known-answer vectors and dual-dim shard locality") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // known answers: bit i of a -> 2i+1, bit i of b -> 2i
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 2L), (0L, 1L, 1L),
      (3L, 5L, 27L), (7L, 7L, 63L), (255L + 256L, 1L, 0xAAAAL + 1L))
    // (a=511 wraps to 255 at bits=8 -> a-bits at all odd positions = 0xAAAA)
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(graft.scale.Sharding.zOrderKey(col("a"), col("b"), bits = 3).as("z3"),
        graft.scale.Sharding.zOrderKey(col("a"), col("b"), bits = 8).as("z8"))
      .collect()
    assert(got(3).getLong(0) == 27L && got(4).getLong(0) == 63L)
    assert(got(0).getLong(0) == 0L && got(1).getLong(0) == 2L && got(2).getLong(0) == 1L)
    assert(got(5).getLong(1) == 0xAAAAL + 1L) // 255 interleaved odd + b=1 at bit 0

    // locality: on a full 64x64 grid, 16 z-shards (top 4 interleaved
    // bits = 2 high bits of EACH dim) partition the grid into 16x16
    // cells: both spans <= 15, every cell exactly 64*64/16 points
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val spans = grid
      .select(col("a"), col("b"),
        graft.scale.Sharding.zOrderKey(col("a"), col("b"), bits = 6).as("z"))
      .withColumn("shard", expr("z div 256"))
      .groupBy("shard")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"),
        count(lit(1)).as("n"))
      .collect()
    assert(spans.length == 16)
    spans.foreach { r =>
      assert(r.getLong(1) <= 15, s"a-span ${r.getLong(1)} exceeds the cell bound")
      assert(r.getLong(2) <= 15, s"b-span ${r.getLong(2)} exceeds the cell bound")
      assert(r.getLong(3) == 256L) // equal-size cells: 64*64/16
    }
  }
}
