package graft.streaming

import java.util.concurrent.Semaphore
import java.util.concurrent.TimeUnit

/** Driver-side resilience for sink calls (SURVEY §2.5 E6): the reference
  * wraps every Kafka produce and Schema Registry call in a Resilience4j
  * circuit breaker + bulkhead (`service/EventPublisher.java:49-50`,
  * `application.yml:177-209`). In the Spark architecture the *tasks* are
  * already guarded (task retry, checkpoint replay), so the breaker's job
  * moves to the driver's `foreachBatch` boundary: stop hammering a failing
  * external sink, divert batches to the retry path while open, and probe
  * with a bounded number of trial batches before resuming.
  *
  * Count-based sliding window with the reference's exact parameters:
  * window 10, minimum 5 calls, 50% failure-rate threshold, 10 s open
  * duration (automatic transition to half-open), 3 permitted half-open
  * probes. Clock injectable for deterministic specs.
  */
final class CircuitBreaker(
    val slidingWindowSize: Int = 10,
    val minimumCalls: Int = 5,
    val failureRateThreshold: Double = 50.0,
    val waitDurationInOpenMs: Long = 10000L,
    val permittedCallsInHalfOpen: Int = 3,
    clock: () => Long = () => System.currentTimeMillis()) {

  import CircuitBreaker._

  private var st: State = Closed
  private var openedAt: Long = 0L
  // ring buffer of the last `slidingWindowSize` outcomes (true = failure)
  private val window = new Array[Boolean](slidingWindowSize)
  private var calls = 0
  private var halfOpenPermits = 0
  private var halfOpenFailures = 0
  private var halfOpenDone = 0

  private def failureRate: Double = {
    val n = math.min(calls, slidingWindowSize)
    if (n == 0) 0.0
    else 100.0 * (0 until n).count(window(_)) / n
  }

  private def record(failed: Boolean): Unit = {
    window(calls % slidingWindowSize) = failed
    calls += 1
  }

  private def reset(): Unit = {
    calls = 0; halfOpenPermits = 0; halfOpenFailures = 0; halfOpenDone = 0
  }

  /** Current state, after any clock-driven automatic transition. */
  def state: String = synchronized { tick(); st.name }

  private def tick(): Unit =
    if (st == Open && clock() - openedAt >= waitDurationInOpenMs) {
      st = HalfOpen
      reset()
    }

  /** Ask permission to make one sink call. Open -> false (divert the
    * batch); half-open -> true for the first `permittedCallsInHalfOpen`
    * probes only.
    */
  def tryAcquire(): Boolean = synchronized {
    tick()
    st match {
      case Closed => true
      case Open   => false
      case HalfOpen =>
        if (halfOpenPermits < permittedCallsInHalfOpen) {
          halfOpenPermits += 1
          true
        } else false
    }
  }

  def onSuccess(): Unit = synchronized { complete(failed = false) }
  def onFailure(): Unit = synchronized { complete(failed = true) }

  private def complete(failed: Boolean): Unit = st match {
    case HalfOpen =>
      halfOpenDone += 1
      if (failed) halfOpenFailures += 1
      if (halfOpenDone == permittedCallsInHalfOpen) {
        val rate = 100.0 * halfOpenFailures / permittedCallsInHalfOpen
        if (rate >= failureRateThreshold) { st = Open; openedAt = clock() }
        else st = Closed
        reset()
      }
    case _ =>
      record(failed)
      if (st == Closed && calls >= minimumCalls &&
          failureRate >= failureRateThreshold) {
        st = Open
        openedAt = clock()
        reset()
      }
  }

  /** Guard one sink call: returns true when the call ran (successfully or
    * not, with the outcome recorded), false when the breaker rejected it —
    * divert the batch to the retry path in that case. The sink exception
    * is swallowed after recording: the stream must survive a failing
    * sink (that is the breaker's purpose); the batch belongs on the
    * retry/DLQ path, not in a stream teardown.
    */
  def protect(call: () => Unit): Boolean =
    if (!tryAcquire()) false
    else {
      try { call(); onSuccess() }
      catch { case scala.util.control.NonFatal(_) => onFailure() }
      true
    }
}

object CircuitBreaker {
  private sealed abstract class State(val name: String)
  private case object Closed extends State("CLOSED")
  private case object Open extends State("OPEN")
  private case object HalfOpen extends State("HALF_OPEN")
}

/** Bulkhead (`application.yml` kafka-consumer: 10 concurrent, 5 s wait):
  * bounds concurrent driver-side sink calls — the per-executor analog is
  * `maxOffsetsPerTrigger` backpressure, which bounds work per batch.
  */
final class Bulkhead(maxConcurrent: Int = 10, maxWaitMs: Long = 5000L) {
  private val permits = new Semaphore(maxConcurrent, true)

  def tryEnter(): Boolean = permits.tryAcquire(maxWaitMs, TimeUnit.MILLISECONDS)
  def exit(): Unit = permits.release()

  /** Run `call` under a permit; false when saturated past the wait. */
  def protect(call: () => Unit): Boolean =
    if (!tryEnter()) false
    else try { call(); true } finally exit()
}
