package graft

import graft.functions.Hashing
import graft.operators.PartitionKeys
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** P1a-P1h truth tables + P2 hash-family parity (SURVEY §5.1). */
class PartitionKeysSpec extends SparkSpec {

  private def oneKey(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("k")).collect()(0).getString(0)
  }

  test("P1a tenant key defaults on null/empty") {
    assert(oneKey(PartitionKeys.tenantBased(lit("t-1"))) == "t-1")
    assert(oneKey(PartitionKeys.tenantBased(lit(""))) == "default-tenant")
    assert(oneKey(PartitionKeys.tenantBased(lit(null).cast("string"))) == "default-tenant")
  }

  test("P1b user falls back to tenant then default") {
    assert(oneKey(PartitionKeys.userBased(lit("u"), lit("t"))) == "u")
    assert(oneKey(PartitionKeys.userBased(lit(""), lit("t"))) == "t")
    assert(oneKey(PartitionKeys.userBased(lit(""), lit(""))) == "default-tenant")
  }

  test("P1f composite applies both defaults") {
    assert(oneKey(PartitionKeys.composite(lit("t"), lit("u"))) == "t:u")
    assert(oneKey(PartitionKeys.composite(lit(""), lit("u"))) == "default:u")
    assert(oneKey(PartitionKeys.composite(lit("t"), lit(""))) == "t:system")
    assert(oneKey(PartitionKeys.composite(lit(""), lit(""))) == "default:system")
  }

  test("P3 balance heuristic: length >= 8 and not all digits") {
    import spark.implicits._
    val got = Seq("tenant-1", "12345678", "short", "abcdefgh")
      .toDF("k").select(PartitionKeys.isBalancedKey(col("k")).as("b"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, true))
  }

  test("P2 native java_hash_partition matches String.hashCode for arbitrary keys") {
    Hashing.register(spark)
    import spark.implicits._
    val keys = Seq("tenant-1", "default-tenant", "PRIORITY_MEDIUM", "corr-42",
      "a", "", "user-999:tenant-3", "zz-é中")
    val got = keys.toDF("k")
      .select(col("k"), Hashing.partitionFor(col("k"), 6, "java").as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    keys.foreach { k =>
      val expected = if (k.isEmpty) 0 else math.abs(k.hashCode) % 6
      assert(got(k) == expected, s"key '$k'")
    }
  }

  test("P2 column-HOF javaHashPartition agrees with the native expression") {
    import spark.implicits._
    val keys = Seq("tenant-1", "default-tenant", "corr-7", "abcdefgh")
    val rows = keys.toDF("k").select(
        PartitionKeys.javaHashPartition(col("k"), 6).as("hof"),
        col("k"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == math.abs(r.getString(1).hashCode) % 6, r.getString(1))
    }
  }

  test("P2 murmur2 known-answer vectors (Kafka Utils.murmur2 values)") {
    // Fixed vectors from Apache Kafka's public UtilsTest.testMurmur2 —
    // independent of this repo's transcription, so they pin byte-chunking,
    // tail handling (lengths % 4 = 0..3) and the final mix.
    val vectors = Map(
      "21" -> -973932308,
      "foobar" -> -790332482,
      "a-little-bit-long-string" -> -985981536,
      "a-little-bit-longer-string" -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8" -> -58897971,
      "abc" -> 479470107)
    vectors.foreach { case (k, expected) =>
      assert(Hashing.murmur2(k.getBytes("UTF-8")) == expected, s"murmur2('$k')")
    }
    // ... and the derived Kafka placements (toPositive(h) % n) for n = 6.
    vectors.foreach { case (k, h) =>
      assert(Hashing.murmur2Partition(UTF8String.fromString(k), 6) ==
        (h & 0x7fffffff) % 6, s"partition('$k')")
    }
    assert(Hashing.murmur2("".getBytes("UTF-8")) == Hashing.murmur2(Array.emptyByteArray))
    // placement is stable, in range, and 0 for empty keys
    assert(Hashing.murmur2Partition(UTF8String.fromString(""), 6) == 0)
    val gen = Gen.asciiPrintableStr
    (0 until 200).foreach { i =>
      val s = gen.apply(Gen.Parameters.default, Seed(i.toLong)).getOrElse("x")
      if (s.nonEmpty) {
        val p = Hashing.murmur2Partition(UTF8String.fromString(s), 6)
        assert(p >= 0 && p < 6, s"key '$s'")
      }
    }
  }

  test("P2 murmur2 expression matches the Kafka known-answer placements end to end") {
    Hashing.register(spark)
    import spark.implicits._
    val expected = Map(
      "21" -> -973932308, "foobar" -> -790332482,
      "a-little-bit-long-string" -> -985981536,
      "a-little-bit-longer-string" -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8" -> -58897971,
      "abc" -> 479470107)
    val rows = expected.keys.toSeq.toDF("k")
      .select(col("k"), Hashing.partitionFor(col("k"), 12, "murmur2").as("p"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == (expected(r.getString(0)) & 0x7fffffff) % 12,
        s"key '${r.getString(0)}'")
    }
  }

  test("P2 column-HOF javaHashPartition agrees with native across generated keys") {
    Hashing.register(spark)
    import spark.implicits._
    val gen = Gen.asciiPrintableStr
    val keys = (0 until 200).map { i =>
      gen.apply(Gen.Parameters.default, Seed(1000L + i)).getOrElse("x")
    }.filter(_.nonEmpty).distinct
    val rows = keys.toDF("k").select(
        PartitionKeys.javaHashPartition(col("k"), 6).as("hof"),
        Hashing.partitionFor(col("k"), 6, "java").as("native"),
        col("k"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"key '${r.getString(2)}'")
      assert(r.getInt(0) == math.abs(r.getString(2).hashCode) % 6)
    }
  }

  test("P2 murmur2 expression evaluates identically to the Scala function") {
    Hashing.register(spark)
    import spark.implicits._
    val keys = Seq("tenant-1", "x", "PRIORITY_HIGH", "1234567890abcdef")
    val rows = keys.toDF("k")
      .select(col("k"), Hashing.partitionFor(col("k"), 6, "murmur2").as("p"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) ==
        (Hashing.murmur2(r.getString(0).getBytes("UTF-8")) & 0x7fffffff) % 6)
    }
  }
}
