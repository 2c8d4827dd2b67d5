package graft

import graft.streaming.{Bulkhead, CircuitBreaker}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

final case class Msg(id: Long, payload: String)

/** CircuitBreaker state machine with the reference's Resilience4j
  * parameters (window 10, min 5 calls, 50%, open 10 s, 3 half-open
  * probes) under an injected clock, plus the foreachBatch guard shape.
  */
class ResilienceSpec extends SparkSpec {

  private def breaker(now: () => Long) = new CircuitBreaker(clock = now)

  test("closed until min calls, opens at 50% failure rate over the window") {
    var t = 0L
    val cb = breaker(() => t)
    // 4 calls, all failures: below minimum-number-of-calls -> still closed
    (1 to 4).foreach { _ => assert(cb.tryAcquire()); cb.onFailure() }
    assert(cb.state == "CLOSED")
    // 5th call fails -> 5/5 = 100% >= 50% -> OPEN, callers rejected
    assert(cb.tryAcquire()); cb.onFailure()
    assert(cb.state == "OPEN")
    assert(!cb.tryAcquire())
  }

  test("mixed outcomes below threshold never open; sliding window forgets") {
    var t = 0L
    val cb = breaker(() => t)
    // one failure in five: 20% failure rate in any window prefix
    (1 to 20).foreach { i =>
      assert(cb.tryAcquire())
      if (i % 5 == 0) cb.onFailure() else cb.onSuccess()
    }
    assert(cb.state == "CLOSED")
  }

  test("open auto-transitions to half-open after the wait; 3 probes decide") {
    var t = 0L
    val cb = breaker(() => t)
    (1 to 5).foreach { _ => cb.tryAcquire(); cb.onFailure() }
    assert(cb.state == "OPEN")
    t += 9999
    assert(!cb.tryAcquire(), "still open just before the wait elapses")
    t += 1
    assert(cb.state == "HALF_OPEN")
    // exactly 3 permitted probes; a 4th concurrent caller is rejected
    assert(cb.tryAcquire() && cb.tryAcquire() && cb.tryAcquire())
    assert(!cb.tryAcquire())
    // all probes succeed -> CLOSED again
    cb.onSuccess(); cb.onSuccess(); cb.onSuccess()
    assert(cb.state == "CLOSED")
  }

  test("failing probes relapse to open") {
    var t = 0L
    val cb = breaker(() => t)
    (1 to 5).foreach { _ => cb.tryAcquire(); cb.onFailure() }
    t += 10000
    assert(cb.state == "HALF_OPEN")
    (1 to 3).foreach { _ => cb.tryAcquire(); cb.onFailure() }
    assert(cb.state == "OPEN")
    assert(!cb.tryAcquire())
  }

  test("foreachBatch guard: breaker opens on a failing sink and diverts batches") {
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    var t = 0L
    val cb = new CircuitBreaker(minimumCalls = 2, slidingWindowSize = 2, clock = () => t)
    var attempts = 0
    var diverted = List.empty[Long]
    val input = MemoryStream[Msg]
    val q = input.toDF().writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val ran = cb.protect { () =>
          attempts += 1
          batch.count() // touch the batch, then the sink "fails"
          throw new RuntimeException("sink down")
        }
        if (!ran) diverted = diverted :+ id
    }.start()
    try {
      input.addData(Msg(1, "a")); q.processAllAvailable()
      input.addData(Msg(2, "b")); q.processAllAvailable()
      // two failures over window 2 -> OPEN; next batches never hit the sink
      input.addData(Msg(3, "c")); q.processAllAvailable()
      input.addData(Msg(4, "d")); q.processAllAvailable()
    } finally q.stop()
    assert(attempts == 2, s"sink must not be called while open (attempts=$attempts)")
    assert(diverted.size == 2, s"open-state batches divert to retry (diverted=$diverted)")
    assert(cb.state == "OPEN")
  }

  test("bulkhead bounds concurrency and rejects when saturated") {
    val bh = new Bulkhead(maxConcurrent = 2, maxWaitMs = 10)
    assert(bh.tryEnter() && bh.tryEnter())
    assert(!bh.tryEnter(), "third concurrent call must be rejected")
    bh.exit()
    assert(bh.protect(() => ()))
    bh.exit()
  }
}
