package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Bench {

  /** Bench hygiene guard: java processes on this host that are NOT this
    * JVM or its ancestors (sbt launches the bench forked). Round-2 bench
    * numbers were inflated 3-8x by concurrent sbt/Spark processes; the
    * count is stamped into the output JSON so a polluted run can never
    * ship as an unlabeled number.
    */
  def foreignJvms(): Int = try {
    val self = ProcessHandle.current()
    var lineage = Set(self.pid)
    var cur = self
    while (cur.parent().isPresent && lineage.size < 16) {
      cur = cur.parent().get
      lineage += cur.pid
    }
    java.util.stream.StreamSupport
      .stream(java.util.Spliterators.spliteratorUnknownSize(
        ProcessHandle.allProcesses().iterator(), 0), false)
      .filter { h =>
        !lineage.contains(h.pid) &&
          h.info().command().map[Boolean](c =>
            c.endsWith("/java") || c == "java").orElse(false)
      }
      .count().toInt
  } catch {
    // restricted /proc must degrade to "unknown" (-1), never kill the bench
    case _: Throwable => -1
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val jvmsBefore = foreignJvms()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink, not count(): count() lets Catalyst prune every projection
    // (a key-derivation query would degenerate to a scan row count) — the
    // noop write forces full computation of all output columns.
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                name: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      finally Caches.release()
      (System.nanoTime() - t0) / 1e9
    }
    // JIT/codegen warm-up so the first measured query isn't charged for it
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // sorted order, best-of-2 per query: stable across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> math.min(runOnce(fn, name), runOnce(fn, name))
    }.toMap

    // Decode-path micro-bench: the one-pass graft_proto_struct vs the
    // 10-scan per-field composition over the SAME materialized wire
    // bytes (fixture encode excluded from both arms), full-struct output
    // through the noop sink. Surfaces the decode-once win as data.
    graft.functions.Hashing.register(spark)
    val decode = {
      import spark.implicits._
      import graft.functions.ProtoWire._
      val wire = graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), unix_micros(col("ts")).as("micros"), col("user_id"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { case (id, micros, user) =>
            (id, message(lenField(1, message(
              stringField(1, id.toString),
              stringField(2, s"corr-${id % 97}"),
              stringField(3, s"svc-${id % 7}"),
              timestampField(4, Math.floorDiv(micros, 1000000L),
                (Math.floorMod(micros, 1000000L) * 1000L).toInt),
              varintField(5, id % 3 + 1),
              mapEntryField(6, "h1", s"v${id % 11}"),
              stringField(7, s"tenant-${user % 50}"),
              stringField(8, user.toString),
              varintField(9, id % 5),
              varintField(10, id % 5)))))
          }
        }.toDF("event_id", "value").persist()
      wire.count() // materialize so neither arm pays the encode
      def arm(decoder: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Double = {
        val t0 = System.nanoTime()
        wire.select(col("event_id"), decoder(col("value")).as("m")).select("event_id", "m.*")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val onePass = math.min(arm(graft.io.KafkaIO.decodeEventMetadata),
        arm(graft.io.KafkaIO.decodeEventMetadata))
      val perField = math.min(arm(graft.io.KafkaIO.decodeEventMetadataPerField),
        arm(graft.io.KafkaIO.decodeEventMetadataPerField))
      // scan-only floor (cache read + noop write, zero decode): subtract
      // from both arms for the pure-decode ratio
      def floorOnce(): Double = {
        val t0 = System.nanoTime()
        wire.select(col("event_id"), length(col("value")).as("len"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val scanFloor = math.min(floorOnce(), floorOnce())
      wire.unpersist()
      (onePass, perField, scanFloor)
    }

    val jvmsAfter = foreignJvms()
    val foreign = math.max(jvmsBefore, jvmsAfter)
    // 1-minute load average: catches non-JVM host contention the process
    // guard can't see (shared-host noise) — stamped, not judged
    val load1 = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
    } catch { case _: Throwable => -1.0 }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""decode_struct_sec":${decode._1},"decode_perfield_sec":${decode._2},""" +
      s""""decode_floor_sec":${decode._3},""" +
      s""""foreign_jvms":$foreign,"load1":$load1,"clean":${foreign == 0}}""")
    // (foreign == -1 reads as not-clean: an unverifiable environment is
    // flagged rather than assumed idle)
    if (foreign > 0)
      System.err.println(s"[bench] WARNING: $foreign concurrent java process(es) " +
        "detected — timings may be contention-inflated; rerun on an idle host")
    spark.stop()
  }
}
