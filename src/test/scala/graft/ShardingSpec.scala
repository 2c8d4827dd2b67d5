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
}
