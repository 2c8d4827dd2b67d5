package graft

import graft.streaming.{HHRow, TokRow, TwsHeavyHitters}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.util.Try

/** Space-saving invariants for the streaming heavy-hitter table, fed in
  * three seq-contiguous micro-batches over a skewed synthetic stream:
  *
  *  1. stream ≡ single-pass: the final table equals a reference one-pass
  *     space-saving run over the same total (seq) order;
  *  2. the classic guarantee: every token with true count > N/k is IN the
  *     final table;
  *  3. estimate bounds: count − err ≤ true count ≤ count for every entry;
  *  4. state is bounded: table size ≤ k at every emission.
  */
class TwsHeavyHittersSpec extends SparkSpec {

  private val K = 4

  // skewed stream: a×40, b×25, c×10, 25 singletons — N=100, N/k=25
  private val stream: Seq[(Long, String)] = {
    val toks = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(10)("c") ++
      (1 to 25).map(i => f"d$i%02d")
    // deterministic interleave so the singletons churn the table mid-run
    val arranged = toks.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)
    arranged.zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  /** Reference single-pass space-saving with the processor's tie-break. */
  private def reference(rows: Seq[(Long, String)], k: Int): Seq[(String, Long, Long)] = {
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val errs = scala.collection.mutable.ArrayBuffer.empty[Long]
    rows.sortBy(_._1).foreach { case (_, t) =>
      val idx = tokens.indexOf(t)
      if (idx >= 0) counts(idx) += 1
      else if (tokens.length < k) { tokens += t; counts += 1L; errs += 0L }
      else {
        var mi = 0
        for (i <- 1 until counts.length)
          if (counts(i) < counts(mi) ||
              (counts(i) == counts(mi) && tokens(i) < tokens(mi))) mi = i
        val ev = counts(mi)
        tokens(mi) = t; counts(mi) = ev + 1; errs(mi) = ev
      }
    }
    tokens.indices.map(i => (tokens(i), counts(i), errs(i)))
      .sortBy { case (t, c, e) => (-c, e, t) }
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  test("space-saving table: stream equals single pass, guarantee and bounds hold") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val trueCounts = stream.groupBy(_._2).map { case (t, r) => t -> r.size.toLong }
    val n = stream.size.toLong
    val expected = reference(stream, K)

    withRocksDb {
      val out = java.nio.file.Files.createTempDirectory("tws-hh").toString
      val input = MemoryStream[TokRow]
      // seq-CONTIGUOUS batches: batch boundaries preserve the total order
      val ordered = stream.sortBy(_._1).map { case (s, t) => TokRow("g", s, t) }
      val batches = ordered.grouped((ordered.length + 2) / 3).toSeq
      batches.zipWithIndex.foreach { case (rows, bi) =>
        // scramble WITHIN the batch — the processor's seq sort restores it
        val scrambled = rows.sortBy(r => (r.seq * 2654435761L) % 1000003)
        input.addData(scrambled: _*)
        val q = TwsHeavyHitters.heavyHitters(input.toDS(), k = K)
          .writeStream
          .option("checkpointLocation", s"$out/_cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (df: org.apache.spark.sql.Dataset[HHRow], _: Long) =>
            df.withColumn("feed", lit(bi))
              .write.mode("append").parquet(s"$out/rows"); ()
          }
          .start()
        q.awaitTermination()
      }
      val all = Try(spark.read.parquet(s"$out/rows")).toOption.get
      // 4. bounded state at every emission
      val sizes = all.groupBy("feed").agg(countDistinct("token").as("sz"))
        .select("sz").as[Long].collect()
      assert(sizes.forall(_ <= K), s"table exceeded k=$K: ${sizes.mkString(",")}")

      val maxFeed = all.agg(max("feed")).head.getInt(0)
      val got = all.filter(col("feed") === maxFeed)
        .orderBy("rank")
        .select("token", "count", "err")
        .as[(String, Long, Long)].collect().toSeq
      // 1. stream ≡ reference single pass
      assert(got == expected, s"stream $got vs reference $expected")
      // 2. guarantee: true count > N/k ⇒ present
      trueCounts.filter(_._2 > n / K).keys.foreach { t =>
        assert(got.exists(_._1 == t), s"heavy token $t missing from $got")
      }
      // 3. count − err ≤ true ≤ count for tracked tokens
      got.foreach { case (t, c, e) =>
        val tc = trueCounts.getOrElse(t, 0L)
        assert(c - e <= tc && tc <= c, s"bounds violated for $t: $c-$e vs $tc")
      }
    }
  }
}
