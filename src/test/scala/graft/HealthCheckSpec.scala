package graft

import graft.observe.HealthCheck

/** HealthCheck thresholds (reference checkHealth / health indicator). */
class HealthCheckSpec extends SparkSpec {

  private def lagFrame(lags: (String, Long)*) = {
    import spark.implicits._
    lags.toSeq.toDF("topic", "lag")
  }

  test("status tiers follow the reference thresholds") {
    assert(HealthCheck.evaluate(lagFrame("a" -> 100L, "b" -> 200L)).status == "OK")
    val warn = HealthCheck.evaluate(lagFrame("a" -> 9000L, "b" -> 6000L))
    assert(warn.status == "WARN" && warn.totalLag == 15000L)
    val bad = HealthCheck.evaluate(lagFrame("a" -> 150000L, "b" -> 10L))
    assert(bad.status == "UNHEALTHY" && bad.worstTopic == "a" && bad.worstTopicLag == 150000L)
  }

  test("empty lag frame is healthy") {
    val r = HealthCheck.evaluate(lagFrame())
    assert(r.status == "OK" && r.totalLag == 0L && r.topicsChecked == 0L)
  }
}
