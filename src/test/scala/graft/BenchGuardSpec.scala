package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench hygiene guard primitives (VERDICT r3 #1): the shipped artifact
  * must be able to PROVE the run was quiet, so the /proc samplers behind
  * the `clean` stamp are pinned here on the live host.
  */
class BenchGuardSpec extends AnyFunSuite {

  test("load1 reads a plausible 1-minute load average (or degrades to -1)") {
    val l = Bench.load1()
    assert(l == -1.0 || (l >= 0.0 && l < 10000.0))
  }

  test("cpuSample isolates this process's jiffies from host-wide busy") {
    val (busy1, self1) = Bench.cpuSample()
    assume(busy1 >= 0, "/proc restricted on this host")
    // burn ~0.4 s of CPU in-process so the self counter must advance
    val stop = System.nanoTime() + 400000000L
    var x = 0L
    while (System.nanoTime() < stop) { x += 1 }
    assert(x > 0)
    val (busy2, self2) = Bench.cpuSample()
    val dSelf = self2 - self1
    val dBusy = busy2 - busy1
    assert(dSelf > 0, "self jiffies did not advance during a busy loop")
    // host-wide busy includes us: foreign = busy - self stays bounded by
    // the machine. Both sides are jiffy-quantized INDEPENDENTLY (the
    // /proc/stat busy sum per-CPU, /proc/self/stat per-thread), so with
    // 32 CPUs and a many-threaded JVM the difference can round a handful
    // of jiffies negative (observed -4 on this host over a 0.4 s window);
    // bound the rounding by a per-core allowance, not a constant.
    val foreign = dBusy - dSelf
    val cores = Runtime.getRuntime.availableProcessors()
    assert(foreign >= -math.max(2L, cores / 2L) && foreign <= 41L * cores)
  }

  test("a foreign CPU burner shows up in the busy-minus-self delta") {
    val (busy1, self1) = Bench.cpuSample()
    assume(busy1 >= 0, "/proc restricted on this host")
    // burn CPU in a CHILD process (killed below): its jiffies land in
    // host busy but not in /proc/self/stat — what the clean gate must see
    val burner = new ProcessBuilder("sh", "-c", "while :; do :; done").start()
    try {
      Thread.sleep(1500)
      val (busy2, self2) = Bench.cpuSample()
      val foreignJiffies = (busy2 - busy1) - (self2 - self1)
      // one busy-looping shell for 1.5 s ~ 150 jiffies; kernel noise alone
      // stays far below 50 on an idle host
      assert(foreignJiffies > 50,
        s"burner invisible: foreign delta $foreignJiffies jiffies")
    } finally burner.destroyForcibly()
  }

  test("foreignJvms counts other JVMs, excluding our own lineage") {
    val n = Bench.foreignJvms()
    // this test runs inside sbt's forked JVM tree: lineage must be excluded
    assert(n >= -1)
  }
}
