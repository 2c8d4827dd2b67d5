package graft

import graft.scale.{Sampling, TextOps}
import org.apache.spark.sql.functions._

/** Sampling.rebalanceToTarget + TextOps.ngramsAll. */
class SamplingRebalanceSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("rebalance hits the target mixture within hash-gate noise") {
    val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.1, "zh" -> 0.1)
    val kept = Sampling.rebalanceToTarget(docs, "doc_id", "lang", targets, "spec")
      .groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = kept.values.sum.toDouble
    targets.foreach { case (l, want) =>
      val got = kept.getOrElse(l, 0L) / total
      // hash-gate realization noise at this corpus size; the scale factor
      // also caps strata asked to give more than they have
      assert(math.abs(got - want) < 0.08, s"$l: share $got vs target $want")
    }
  }

  test("rebalance keep-decisions are deterministic and a pure key function") {
    val targets = Map("en" -> 0.5, "de" -> 0.5)
    def ids() = Sampling.rebalanceToTarget(docs, "doc_id", "lang", targets, "s2")
      .select("doc_id").as[Long].collect().toSet
    val a = ids()
    val b = ids()
    assert(a == b && a.nonEmpty)
    // strata outside the target map are dropped entirely
    val langs = Sampling.rebalanceToTarget(docs, "doc_id", "lang", targets, "s2")
      .select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de")))
  }

  test("ngramsAll keeps duplicates; shingles is its distinct projection") {
    val d = Seq("a b c a b c a b").toDF("text")
    val all = d.select(TextOps.ngramsAll(col("text"), 3).as("g"))
      .as[Seq[String]].head()
    assert(all.size == 6)   // 8 tokens -> 6 trigrams
    assert(all.count(_ == "a b c") == 2)
    val dist = d.select(TextOps.shingles(col("text"), 3).as("g"))
      .as[Seq[String]].head()
    assert(dist.sorted == all.distinct.sorted)
  }
}
