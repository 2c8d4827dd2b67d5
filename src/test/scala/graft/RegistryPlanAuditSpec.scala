package graft

/** Whole-registry plan audit, automated (was a manual judge/round-3 pass):
  * EVERY registered query's physical plan must be free of
  * CartesianProduct. A cartesian is the one join shape that cannot
  * survive a 100× scale-up under any partitioning — the broadcast
  * nested-loop joins the registry does contain are deliberate 1-row
  * scalar / bounded-codebook broadcasts, which Spark plans as BNLJ, never
  * as CartesianProduct. Planning only (executedPlan is built, nothing is
  * executed), except the handful of builds that eagerly compute a
  * broadcast scalar (percentile thresholds, bloom sizing) at sf0.001.
  */
class RegistryPlanAuditSpec extends SparkSpec {

  test("no CartesianProduct in any registered query's physical plan") {
    graft.functions.Hashing.register(spark)
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val plan =
        try SparkEntry.registry(name).build(spark, dir)
          .queryExecution.executedPlan.toString
        finally Caches.release()
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian-product plans (scale bug): ${offenders.mkString(", ")}")
  }
}
