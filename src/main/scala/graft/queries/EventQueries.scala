package graft.queries

import graft.QueryDef
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-checked batch queries over the synthesized event envelope —
  * SURVEY §2.2-§2.5 operators in deterministic DataFrame form.
  *
  * Convention for DuckDB parity (SURVEY §5.2):
  *   - every double aggregate goes through an exact DECIMAL sum and is cast
  *     to double at the end (partial-aggregation order then cannot change
  *     the result);
  *   - every query ends with a total ORDER BY;
  *   - nondeterministic operators (uuid round-robin P1g, E2 jitter) are
  *     excluded from hashed queries and covered by ScalaTest bounds specs.
  */
object EventQueries {

  private val cte = Envelope.oracleCte

  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.withEnvelope(Tables.events(s, dir))

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))

  /** Synthetic event-class name so the P1h CUSTOM dispatch exercises every
    * branch (the raw fixture event types contain none of the trigger words).
    */
  private def className(c: org.apache.spark.sql.Column) =
    when(c === "signup", "TenantCreatedEvent")
      .when(c === "click", "UserLoginEvent")
      .when(c === "view", "NotificationSentEvent")
      .when(c === "purchase", "PaymentProcessedEvent")
      .otherwise("ErrorEvent")

  private val classNameSql =
    """CASE event_type WHEN 'signup' THEN 'TenantCreatedEvent'
      | WHEN 'click' THEN 'UserLoginEvent' WHEN 'view' THEN 'NotificationSentEvent'
      | WHEN 'purchase' THEN 'PaymentProcessedEvent' ELSE 'ErrorEvent' END""".stripMargin

  // --- DuckDB replays of the three placement hash families (P2) ---
  // All 32-bit arithmetic is modeled on the UNSIGNED 0..2^32-1 range in
  // BIGINT: xor and >>> translate directly; int multiplication needs a
  // HUGEINT product reduced mod 2^32 (BIGINT*BIGINT would overflow).

  /** Java 32-bit product, DuckDB spelling. */
  private def mul32(x: String, c: Long): String =
    s"CAST((CAST(($x) AS HUGEINT) * $c) % 4294967296 AS BIGINT)"

  /** 32-bit rotate-left: the two shifted halves occupy disjoint bits, so
    * `+` is the OR.
    */
  private def rotl32(x: String, r: Int): String =
    s"(((($x) << $r) % 4294967296) + (($x) >> ${32 - r}))"

  /** Oracle for `p2_partition_families`: per distinct tenant key, replay
    * Java String.hashCode, Kafka murmur2, and Spark murmur3(seed 42), all
    * in DuckDB integer arithmetic over the key's bytes.
    */
  private val partitionFamiliesOracle: String = {
    // murmur2 main-loop step: little-endian word -> k mixing -> h update
    val m2k0 = "(cs[CAST(4*i+1 AS INT)] + cs[CAST(4*i+2 AS INT)]*256 + " +
      "cs[CAST(4*i+3 AS INT)]*65536 + cs[CAST(4*i+4 AS INT)]*16777216)"
    val m2k1 = mul32(m2k0, 1540483477L) // m = 0x5bd1e995
    val m2k2 = s"xor($m2k1, ($m2k1) >> 24)"
    val m2k3 = mul32(m2k2, 1540483477L)
    val m2step = s"xor(${mul32("h", 1540483477L)}, $m2k3)"
    // murmur3 (Spark) step: mixH1(h, mixK1(w)); Spark's tail bytes take
    // the identical path, so words-then-bytes is ONE reduce
    val m3a = mul32("w", 3432918353L) // c1 = 0xcc9e2d51
    val m3b = rotl32(m3a, 15)
    val m3k = mul32(m3b, 461845907L) // c2 = 0x1b873593
    val m3c = s"xor(h, $m3k)"
    val m3d = rotl32(m3c, 13)
    val m3step = s"((($m3d) * 5 + 3864292196) % 4294967296)" // + 0xe6546b64
    s"""$cte, keyed AS (
       |  SELECT DISTINCT COALESCE(NULLIF(tenant_id,''),'default-tenant') AS key FROM env),
       |b AS (
       |  SELECT key,
       |    list_transform(string_split(key,''), c -> CAST(unicode(c) AS BIGINT)) AS cs,
       |    CAST(strlen(key) AS BIGINT) AS n
       |  FROM keyed),
       |jh AS ( -- Java String.hashCode: h = h*31 + c, signed-int wraparound
       |  SELECT key,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
       |      (a, c) -> (a * 31 + c) % 4294967296) AS hu
       |  FROM b),
       |java_part AS (
       |  -- Java's Math.abs(Integer.MIN_VALUE) overflows back to MIN_VALUE,
       |  -- so a key hashing to exactly -2^31 yields a NEGATIVE remainder
       |  -- (the reference's own quirk, faithfully kept by the Spark side);
       |  -- SQL abs() would silently "fix" it — model the overflow explicitly
       |  SELECT key,
       |    CAST(CASE WHEN hu = 2147483648 THEN (hu - 4294967296) % 6
       |      ELSE abs(CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END) % 6
       |      END AS INT) AS part_java
       |  FROM jh),
       |m1 AS ( -- Kafka murmur2: seed 0x9747b28c ^ len, word loop
       |  SELECT key, cs, n, n % 4 AS rem, n - (n % 4) AS base,
       |    list_reduce(list_prepend(xor(2538058380::BIGINT, n),
       |      list_transform(generate_series(0, CAST(n // 4 AS INT) - 1),
       |        i -> CAST(i AS BIGINT))),
       |      (h, i) -> $m2step) AS h0
       |  FROM b),
       |m2 AS (SELECT key, cs, rem, base, -- tail-byte switch, fallthrough order
       |  CASE WHEN rem >= 3 THEN xor(h0, cs[CAST(base+3 AS INT)] * 65536) ELSE h0 END AS ha
       |  FROM m1),
       |m3 AS (SELECT key, cs, rem, base,
       |  CASE WHEN rem >= 2 THEN xor(ha, cs[CAST(base+2 AS INT)] * 256) ELSE ha END AS hb
       |  FROM m2),
       |m4 AS (SELECT key,
       |  CASE WHEN rem >= 1 THEN ${mul32("xor(hb, cs[CAST(base+1 AS INT)])", 1540483477L)}
       |       ELSE hb END AS hc
       |  FROM m3),
       |m5 AS (SELECT key, ${mul32("xor(hc, hc >> 13)", 1540483477L)} AS he FROM m4),
       |m2_part AS ( -- Kafka placement: toPositive(h) % n == (h mod 2^31) % n
       |  SELECT key, CAST((xor(he, he >> 15) % 2147483648) % 6 AS INT) AS part_murmur2
       |  FROM m5),
       |w AS ( -- Spark murmur3: aligned LE words, then tail bytes verbatim
       |  SELECT key, n,
       |    list_concat(
       |      list_transform(generate_series(0, CAST(n // 4 AS INT) - 1),
       |        i -> cs[CAST(4*i+1 AS INT)] + cs[CAST(4*i+2 AS INT)]*256 +
       |             cs[CAST(4*i+3 AS INT)]*65536 + cs[CAST(4*i+4 AS INT)]*16777216),
       |      list_transform(generate_series(CAST(n - (n % 4) + 1 AS INT), CAST(n AS INT)),
       |        j -> cs[j])) AS ws
       |  FROM b),
       |s1 AS (SELECT key, n,
       |  list_reduce(list_prepend(42::BIGINT, ws), (h, w) -> $m3step) AS h0 FROM w),
       |s2 AS (SELECT key, xor(xor(h0, n), (xor(h0, n)) >> 16) AS ha FROM s1),
       |s3 AS (SELECT key, ${mul32("ha", 2246822507L)} AS hb FROM s2), -- 0x85ebca6b
       |s4 AS (SELECT key, xor(hb, hb >> 13) AS hc FROM s3),
       |s5 AS (SELECT key, ${mul32("hc", 3266489909L)} AS hd FROM s4), -- 0xc2b2ae35
       |s6 AS (SELECT key, xor(hd, hd >> 16) AS he FROM s5),
       |s7 AS (SELECT key,
       |  CASE WHEN he >= 2147483648 THEN he - 4294967296 ELSE he END AS sgn FROM s6),
       |spark_part AS ( -- pmod placement
       |  SELECT key, CAST(((sgn % 6) + 6) % 6 AS INT) AS part_spark FROM s7)
       |SELECT j.key, j.part_java, m.part_murmur2, sp.part_spark
       |FROM java_part j
       |JOIN m2_part m USING (key)
       |JOIN spark_part sp USING (key)
       |ORDER BY j.key""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(

    // F3 validity matrix: valid x too-old counts (too-old is observed, not
    // dropped — reference BaseEventConsumer.java:150-159).
    "f3_validity" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val maxTs = e.agg(max("ts").as("max_ts"))
        e.crossJoin(broadcast(maxTs))
          .select(
            Validation.isValid(col("event_id_s"), col("props")).as("valid"),
            Validation.isTooOld(col("ts"), col("max_ts")).as("too_old"))
          .groupBy("valid", "too_old")
          .agg(count(lit(1)).as("n"))
          .orderBy("valid", "too_old")
      },
      oracle = Some(
        s"""$cte
           |SELECT (props IS NOT NULL AND event_id_s IS NOT NULL AND event_id_s <> '') AS valid,
           |       ts < (SELECT max(ts) FROM env) - INTERVAL 7 DAY AS too_old,
           |       COUNT(*) AS n
           |FROM env GROUP BY 1, 2 ORDER BY valid, too_old""".stripMargin),
      doc = "F3 validity predicate + age flag matrix"),

    // F7: effective retry count with metadata->header->0 fallback.
    "f7_retry_source" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
          .withColumn("meta_retry",
            when(col("event_id") % 7 === 0, lit(null)).otherwise(col("retry_count")))
          .withColumn("hdr_retry",
            when(col("event_id") % 14 === 0, lit(null))
              .otherwise(col("retry_count").cast("string")))
        e.select(Validation.effectiveRetryCount(col("meta_retry"), col("hdr_retry"))
            .as("effective_retry"))
          .groupBy("effective_retry").agg(count(lit(1)).as("n"))
          .orderBy("effective_retry")
      },
      oracle = Some(
        s"""$cte
           |SELECT COALESCE(CASE WHEN event_id % 7 = 0 THEN NULL ELSE retry_count END,
           |                CAST(CASE WHEN event_id % 14 = 0 THEN NULL ELSE CAST(retry_count AS STRING) END AS INT),
           |                0) AS effective_retry,
           |       COUNT(*) AS n
           |FROM env GROUP BY 1 ORDER BY effective_retry""".stripMargin),
      doc = "F7 retry-count extraction with fallback chain"),

    // P1a-P1h key-derivation truth table over the full corpus.
    "p1_keys" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir).withColumn("class_name", className(col("event_type")))
        e.select(
            col("event_id"),
            PartitionKeys.tenantBased(col("tenant_id")).as("k_tenant"),
            PartitionKeys.userBased(col("user_s"), col("tenant_id")).as("k_user"),
            PartitionKeys.correlationBased(col("correlation_id"), col("event_id_s")).as("k_corr"),
            PartitionKeys.priorityBased(col("priority")).as("k_priority"),
            PartitionKeys.eventTypeBased(col("class_name")).as("k_type"),
            PartitionKeys.composite(col("tenant_id"), col("user_s")).as("k_comp"),
            PartitionKeys.custom(col("class_name"), col("tenant_id"), col("user_s"),
              col("correlation_id"), col("event_id_s")).as("k_custom"),
            PartitionKeys.isBalancedKey(
              PartitionKeys.composite(col("tenant_id"), col("user_s"))).as("balanced"))
          .orderBy("event_id")
      },
      oracle = Some(
        s"""$cte, keyed AS (
           |  SELECT event_id, tenant_id, user_s, correlation_id, event_id_s, priority,
           |         $classNameSql AS class_name
           |  FROM env)
           |SELECT event_id,
           |  COALESCE(NULLIF(tenant_id,''),'default-tenant') AS k_tenant,
           |  COALESCE(NULLIF(user_s,''), NULLIF(tenant_id,''), 'default-tenant') AS k_user,
           |  COALESCE(NULLIF(correlation_id,''), NULLIF(event_id_s,''), 'unknown') AS k_corr,
           |  COALESCE(NULLIF(priority,''),'PRIORITY_MEDIUM') AS k_priority,
           |  class_name AS k_type,
           |  COALESCE(NULLIF(tenant_id,''),'default') || ':' || COALESCE(NULLIF(user_s,''),'system') AS k_comp,
           |  CASE
           |    WHEN lower(class_name) LIKE '%tenant%' THEN COALESCE(NULLIF(tenant_id,''),'default-tenant')
           |    WHEN lower(class_name) LIKE '%user%' OR lower(class_name) LIKE '%auth%'
           |      THEN COALESCE(NULLIF(tenant_id,''),'default') || ':' || COALESCE(NULLIF(user_s,''),'system')
           |    WHEN lower(class_name) LIKE '%notification%'
           |      THEN COALESCE(NULLIF(user_s,''), NULLIF(tenant_id,''), 'default-tenant')
           |    ELSE COALESCE(NULLIF(correlation_id,''), NULLIF(event_id_s,''), 'unknown')
           |  END AS k_custom,
           |  (length(COALESCE(NULLIF(tenant_id,''),'default') || ':' || COALESCE(NULLIF(user_s,''),'system')) >= 8
           |   AND NOT regexp_matches(COALESCE(NULLIF(tenant_id,''),'default') || ':' || COALESCE(NULLIF(user_s,''),'system'), '^[0-9]+$$')) AS balanced
           |FROM keyed ORDER BY event_id""".stripMargin),
      doc = "P1a-P1h partition-key strategies + P3 balance heuristic"),

    // P2: partition placement under the reference's Java-hashCode rule —
    // the Spark side runs the native JavaHashPartitionExpr (codegen'd
    // String.hashCode); the oracle reproduces int32 wraparound arithmetic
    // in SQL. Cross-validates the custom Catalyst expression end-to-end.
    "p2_partition_java" -> QueryDef(
      build = (s, dir) => {
        graft.functions.Hashing.register(s)
        val e = env(s, dir)
        e.select(col("event_id"),
            PartitionKeys.tenantBased(col("tenant_id")).as("key"))
          .withColumn("part_java",
            graft.functions.Hashing.partitionFor(col("key"), 6, "java"))
          .groupBy("key", "part_java").agg(count(lit(1)).as("n"))
          .orderBy("key")
      },
      oracle = Some(
        s"""$cte, keyed AS (
           |  SELECT COALESCE(NULLIF(tenant_id,''),'default-tenant') AS key FROM env),
           |hashed AS (
           |  SELECT key,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(string_split(key, ''), c -> CAST(unicode(c) AS BIGINT))),
           |      (a, b) -> (a * 31 + b) % 4294967296) AS hu
           |  FROM keyed)
           |SELECT key,
           |  CAST(abs(CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END) % 6 AS INT) AS part_java,
           |  COUNT(*) AS n
           |FROM hashed GROUP BY 1, 2 ORDER BY key""".stripMargin),
      doc = "P2 Java-hashCode partition placement via native Catalyst expression"),

    // P2 comparison surface across all three hash families. The oracle
    // REPLAYS all three hash algorithms in DuckDB integer arithmetic
    // (mod-2^32 via HUGEINT products, xor/shift on the unsigned
    // representation): Java String.hashCode as a 31-polynomial fold,
    // Kafka's MurmurHash2 (seed 0x9747b28c, m 0x5bd1e995, 24/13/15 mix)
    // incl. the tail-byte switch, and Spark's Murmur3_x86_32 seed-42 with
    // Spark's per-byte tail (each trailing byte gets the full
    // mixK1+mixH1, Murmur3_x86_32.hashUnsafeBytes) and pmod placement.
    // Keys are ASCII (tenant ids), so unicode() code points are the UTF-8
    // bytes both hash families consume. Murmur2 additionally pinned by
    // Kafka known-answer vectors in PartitionKeysSpec.
    "p2_partition_families" -> QueryDef(
      build = (s, dir) => {
        graft.functions.Hashing.register(s)
        val e = env(s, dir)
        e.select(PartitionKeys.tenantBased(col("tenant_id")).as("key")).distinct()
          .withColumn("part_java", graft.functions.Hashing.partitionFor(col("key"), 6, "java"))
          .withColumn("part_murmur2", graft.functions.Hashing.partitionFor(col("key"), 6, "murmur2"))
          .withColumn("part_spark", graft.functions.Hashing.partitionFor(col("key"), 6, "spark"))
          .orderBy("key")
      },
      oracle = Some(partitionFamiliesOracle),
      doc = "P2 all three hash families, each replayed independently in DuckDB integer arithmetic"),

    // A12: keyset pagination — the list-endpoint surface done the way it
    // must be done at scale: the cursor is the last (ts, event_id) of the
    // previous page and the page is a pushed-down range filter + top-N,
    // so page depth costs O(page) regardless of position (OFFSET-based
    // pagination scans and discards everything before the offset — at
    // 100 TB page 10000 would read the whole table). Plan shape:
    // TakeOrderedAndProject (bounded heap, no global sort); on a
    // natively-typed table the ts range also reaches the parquet footer
    // (this fixture's ts is derived by the ns->us normalization, which
    // blocks pushdown — a fixture artifact, not an operator property).
    "a12_events_page" -> QueryDef(
      build = (s, dir) => {
        val cts = lit("2024-01-15 00:00:00").cast("timestamp")
        val cid = lit(4987L)
        env(s, dir)
          .filter(col("ts") > cts ||
            (col("ts") === cts && col("event_id") > cid))
          .orderBy(col("ts"), col("event_id"))
          .limit(50)
          .select("event_id", "ts", "event_type", "tenant_id", "value")
      },
      oracle = Some(
        s"""$cte
           |SELECT event_id, ts, event_type, tenant_id, value
           |FROM env
           |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
           |   OR (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 4987)
           |ORDER BY ts, event_id LIMIT 50""".stripMargin),
      doc = "Keyset pagination: cursor range filter + top-N (O(page) at any depth)"),

    // D1 dedup: inject duplicates, keep first per event_id in event time.
    "d1_dedup" -> QueryDef(
      build = (s, dir) => {
        val dup = Dedup.withInjectedDuplicates(env(s, dir))
        Dedup.keepFirst(dup, Seq("event_id"), Seq("ts"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("sum_value"))
          .orderBy("event_type")
      },
      oracle = Some(
        s"""$cte, dup AS (
           |  SELECT * FROM env
           |  UNION ALL
           |  SELECT * REPLACE (ts + INTERVAL 1 HOUR AS ts) FROM env WHERE event_id % 10 = 0),
           |ranked AS (
           |  SELECT event_type, value, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
           |  FROM dup)
           |SELECT event_type, COUNT(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
           |FROM ranked WHERE rn = 1 GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "D1 idempotent dedup, keep-first-by-event-time"),

    // D3 consumer-scoped dedup: same event consumed by two consumers is NOT
    // a duplicate across them.
    "d3_scoped_dedup" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        val fanned = e.withColumn("consumer", lit("TenantEventConsumer"))
          .unionByName(e.filter(col("event_id") % 4 === 0)
            .withColumn("consumer", lit("AuditEventConsumer")))
        val dup = fanned.unionByName(
          fanned.filter(col("event_id") % 10 === 0)
            .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR")))
        Dedup.keepFirstScoped(dup, "consumer", "event_id", Seq("ts"))
          .groupBy("consumer").agg(count(lit(1)).as("n"))
          .orderBy("consumer")
      },
      oracle = Some(
        s"""$cte, fanned AS (
           |  SELECT 'TenantEventConsumer' AS consumer, event_id, ts FROM env
           |  UNION ALL
           |  SELECT 'AuditEventConsumer' AS consumer, event_id, ts FROM env WHERE event_id % 4 = 0),
           |dup AS (
           |  SELECT * FROM fanned
           |  UNION ALL
           |  SELECT consumer, event_id, ts + INTERVAL 1 HOUR FROM fanned WHERE event_id % 10 = 0),
           |ranked AS (
           |  SELECT consumer, row_number() OVER (PARTITION BY consumer, event_id ORDER BY ts) AS rn
           |  FROM dup)
           |SELECT consumer, COUNT(*) AS n FROM ranked WHERE rn = 1
           |GROUP BY consumer ORDER BY consumer""".stripMargin),
      doc = "D3 per-consumer idempotency scoping"),

    // E1/E2/P5/P6: retry-or-DLQ split with routing topics and backoff.
    "e1_retry_routing" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir).filter(!col("topic").startsWith("_"))
        val routed = e.withColumn("action",
            when(Retry.shouldRetry(col("retry_count")), lit("retry")).otherwise(lit("dlq")))
          .withColumn("route_topic",
            when(Retry.shouldRetry(col("retry_count")),
                 Retry.retryTopic(col("topic"), col("retry_count") + 1))
              .otherwise(Retry.dlqTopic(col("topic"))))
          .withColumn("backoff_ms",
            when(col("retry_count") >= 1, Retry.backoffDelayMs(col("retry_count")))
              .otherwise(lit(0L)))
        routed.groupBy("action", "route_topic", "backoff_ms")
          .agg(count(lit(1)).as("n"))
          .orderBy("action", "route_topic", "backoff_ms")
      },
      oracle = Some(
        s"""$cte
           |SELECT CASE WHEN retry_count < 3 THEN 'retry' ELSE 'dlq' END AS action,
           |  CASE WHEN retry_count < 3 THEN topic || '.retry.' || CAST(retry_count + 1 AS STRING)
           |       ELSE regexp_replace(topic, '^nnipa\\.events\\.', 'nnipa.dlq.') END AS route_topic,
           |  CASE WHEN retry_count >= 1
           |       THEN CAST(least(1000 * pow(2, retry_count - 1), 60000) AS BIGINT)
           |       ELSE 0 END AS backoff_ms,
           |  COUNT(*) AS n
           |FROM env WHERE topic NOT LIKE '\\_%' ESCAPE '\\'
           |GROUP BY 1, 2, 3 ORDER BY action, route_topic, backoff_ms""".stripMargin),
      doc = "E1 retry-vs-DLQ decision + P5/P6 topic naming + E2 backoff"),

    // F8: visible (non-internal) topics, sorted.
    "f8_topics" -> QueryDef(
      build = (s, dir) => Routing.visibleTopics(env(s, dir)),
      oracle = Some(
        s"""$cte
           |SELECT DISTINCT topic FROM env
           |WHERE topic NOT LIKE '\\_%' ESCAPE '\\' ORDER BY topic""".stripMargin),
      doc = "F8 internal-topic filter + sorted listing"),

    // A4: per-topic event statistics (EventStatistics model).
    "a4_event_stats" -> QueryDef(
      build = (s, dir) => {
        val e = env(s, dir)
        e.groupBy("topic")
          .agg(
            count(lit(1)).as("total_events"),
            count(when(col("event_type") =!= "error" && col("event_id_s") =!= "", 1)).as("successful"),
            count(when(col("event_type") === "error", 1)).as("failed"),
            count(when(col("event_id_s") === "", 1)).as("dlq"),
            round(sum(dec(col("proc_ms"))).cast("double") / count(lit(1)), 4).as("avg_proc_ms"),
            max(col("ts")).as("last_event_ts"),
            countDistinct(col("event_type")).as("n_types"))
          .orderBy("topic")
      },
      oracle = Some(
        s"""$cte
           |SELECT topic, COUNT(*) AS total_events,
           |  COUNT(CASE WHEN event_type <> 'error' AND event_id_s <> '' THEN 1 END) AS successful,
           |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS failed,
           |  COUNT(CASE WHEN event_id_s = '' THEN 1 END) AS dlq,
           |  ROUND(CAST(SUM(CAST(proc_ms AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 4) AS avg_proc_ms,
           |  MAX(ts) AS last_event_ts,
           |  COUNT(DISTINCT event_type) AS n_types
           |FROM env GROUP BY topic ORDER BY topic""".stripMargin),
      doc = "A4 per-topic EventStatistics rollup"),

    // A4b: eventsByType map flattened to rows.
    "a4_events_by_type" -> QueryDef(
      build = (s, dir) =>
        env(s, dir).groupBy("topic", "event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("topic", "event_type"),
      oracle = Some(
        s"""$cte
           |SELECT topic, event_type, COUNT(*) AS n
           |FROM env GROUP BY topic, event_type ORDER BY topic, event_type""".stripMargin),
      doc = "A4 eventsByType breakdown"),

    // Ordered-sequence (funnel) conversion over the raw event stream:
    // greedy earliest-occurrence per user (operators/Funnel — t_i = the
    // earliest step-i event strictly after t_{i-1}; greedy is optimal for
    // reachability). k-1 co-partitioned re-aggregations on the user key,
    // no per-user event collection, no row explosion under repeats.
    "funnel_conversion" -> QueryDef(
      build = (s, dir) => Funnel.report(Tables.events(s, dir),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase")),
      oracle = Some(
        """WITH t1 AS (
          |  SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY user_id),
          |t2 AS (
          |  SELECT t1.user_id, t1.t1, min(e.ts) AS t2
          |  FROM t1 LEFT JOIN events e
          |    ON e.user_id = t1.user_id AND e.event_type = 'click' AND e.ts > t1.t1
          |  GROUP BY t1.user_id, t1.t1),
          |t3 AS (
          |  SELECT t2.user_id, t2.t2, min(e.ts) AS t3
          |  FROM t2 LEFT JOIN events e
          |    ON e.user_id = t2.user_id AND e.event_type = 'purchase' AND e.ts > t2.t2
          |  GROUP BY t2.user_id, t2.t2)
          |SELECT step, n_users, sum_uids FROM (
          |  SELECT '01_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users,
          |    CAST(SUM(user_id) AS BIGINT) AS sum_uids FROM t1
          |  UNION ALL
          |  SELECT '02_click', CAST(COUNT(*) AS BIGINT),
          |    CAST(SUM(user_id) AS BIGINT) FROM t2 WHERE t2 IS NOT NULL
          |  UNION ALL
          |  SELECT '03_purchase', CAST(COUNT(*) AS BIGINT),
          |    CAST(SUM(user_id) AS BIGINT) FROM t3 WHERE t3 IS NOT NULL)
          |ORDER BY step""".stripMargin),
      doc = "Greedy earliest-occurrence funnel: view -> click -> purchase conversion depths"),

    // The same funnel under a 1-hour CONVERSION WINDOW: each step must
    // land within an hour of the previous one — the form real funnel
    // dashboards report ("converted within X"). Window arithmetic is
    // exact integer micros on both engines; greedy stays optimal per
    // transition (earliest qualifying occurrence maximizes the remaining
    // window downstream).
    "funnel_windowed" -> QueryDef(
      build = (s, dir) => Funnel.report(Tables.events(s, dir),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
        windowSeconds = Some(3600L)),
      oracle = Some(
        """WITH t1 AS (
          |  SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY user_id),
          |t2 AS (
          |  SELECT t1.user_id, t1.t1, min(e.ts) AS t2
          |  FROM t1 LEFT JOIN events e
          |    ON e.user_id = t1.user_id AND e.event_type = 'click'
          |    AND e.ts > t1.t1
          |    AND epoch_us(e.ts) - epoch_us(t1.t1) <= 3600000000
          |  GROUP BY t1.user_id, t1.t1),
          |t3 AS (
          |  SELECT t2.user_id, t2.t2, min(e.ts) AS t3
          |  FROM t2 LEFT JOIN events e
          |    ON e.user_id = t2.user_id AND e.event_type = 'purchase'
          |    AND e.ts > t2.t2
          |    AND epoch_us(e.ts) - epoch_us(t2.t2) <= 3600000000
          |  GROUP BY t2.user_id, t2.t2)
          |SELECT step, n_users, sum_uids FROM (
          |  SELECT '01_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users,
          |    CAST(SUM(user_id) AS BIGINT) AS sum_uids FROM t1
          |  UNION ALL
          |  SELECT '02_click', CAST(COUNT(*) AS BIGINT),
          |    CAST(SUM(user_id) AS BIGINT) FROM t2 WHERE t2 IS NOT NULL
          |  UNION ALL
          |  SELECT '03_purchase', CAST(COUNT(*) AS BIGINT),
          |    CAST(SUM(user_id) AS BIGINT) FROM t3 WHERE t3 IS NOT NULL)
          |ORDER BY step""".stripMargin),
      doc = "Funnel with a 1-hour conversion window per transition - exact micros bounds"),

    // Time-to-convert distribution per funnel transition: exact-integer
    // microsecond durations, interpolated exact quantiles (the
    // percentile==quantile_cont parity proven by scalar_quantiles_exact),
    // and a mean from the exact sum. Composes Funnel.funnelTimes.
    "funnel_latency" -> QueryDef(
      build = (s, dir) => {
        val ft = graft.operators.Funnel.funnelTimes(Tables.events(s, dir),
          "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
        def leg(label: String, a: String, b: String) =
          ft.filter(col(b).isNotNull)
            .select(lit(label).as("step"),
              (unix_micros(col(b)) - unix_micros(col(a))).as("dur_us"))
        leg("1_view_to_click", "t1", "t2")
          .unionByName(leg("2_click_to_purchase", "t2", "t3"))
          .groupBy("step")
          .agg(
            count(lit(1)).as("n_converted"),
            round(expr("percentile(dur_us, 0.5)") / 1e6, 4).as("p50_s"),
            round(expr("percentile(dur_us, 0.9)") / 1e6, 4).as("p90_s"),
            round((sum("dur_us").cast("double") / count(lit(1))) / 1e6, 4)
              .as("mean_s"))
          .orderBy("step")
      },
      oracle = Some(
        """WITH t1 AS (
          |  SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY user_id),
          |t2 AS (
          |  SELECT t1.user_id, t1.t1, min(e.ts) AS t2
          |  FROM t1 LEFT JOIN events e
          |    ON e.user_id = t1.user_id AND e.event_type = 'click' AND e.ts > t1.t1
          |  GROUP BY t1.user_id, t1.t1),
          |t3 AS (
          |  SELECT t2.user_id, t2.t1, t2.t2, min(e.ts) AS t3
          |  FROM t2 LEFT JOIN events e
          |    ON e.user_id = t2.user_id AND e.event_type = 'purchase' AND e.ts > t2.t2
          |  GROUP BY t2.user_id, t2.t1, t2.t2),
          |legs AS (
          |  SELECT '1_view_to_click' AS step,
          |    date_diff('microseconds', t1, t2) AS dur_us
          |  FROM t2 WHERE t2 IS NOT NULL
          |  UNION ALL
          |  SELECT '2_click_to_purchase',
          |    date_diff('microseconds', t2, t3)
          |  FROM t3 WHERE t3 IS NOT NULL)
          |SELECT step, CAST(COUNT(*) AS BIGINT) AS n_converted,
          |  ROUND(quantile_cont(dur_us, 0.5) / 1e6, 4) AS p50_s,
          |  ROUND(quantile_cont(dur_us, 0.9) / 1e6, 4) AS p90_s,
          |  ROUND((CAST(SUM(dur_us) AS DOUBLE) / COUNT(*)) / 1e6, 4) AS mean_s
          |FROM legs GROUP BY step ORDER BY step""".stripMargin),
      doc = "Funnel time-to-convert: exact-microsecond p50/p90/mean per transition"),

    // Cohorted retention: distinct-collapse (user, day) activity first,
    // derive each user's cohort day, then one co-partitioned join +
    // aggregation — output bounded by days x days (operators/Retention).
    "retention_cohorts" -> QueryDef(
      build = (s, dir) => Retention.dailyCohorts(
        Tables.events(s, dir), "user_id", "ts"),
      oracle = Some(
        """WITH activity AS (
          |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
          |cohorts AS (SELECT u, min(d) AS cohort_day FROM activity GROUP BY u)
          |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
          |  (a.d - c.cohort_day) AS offset_days,
          |  CAST(COUNT(DISTINCT a.u) AS BIGINT) AS n_active
          |FROM activity a JOIN cohorts c ON a.u = c.u
          |GROUP BY c.cohort_day, a.d - c.cohort_day
          |ORDER BY cohort_day, offset_days""".stripMargin),
      doc = "Daily retention cohorts: first-activity day x day-offset active-user grid"),

    // Row-level sessionization (operators/Sessionize): the per-event
    // session label the session_window AGGREGATE (w_session_30m) can't
    // give you; summarized per (user, session) so the oracle hashes the
    // full labeling without shipping one row per event.
    "sessionize_ids" -> QueryDef(
      build = (s, dir) => Sessionize.withSessionIds(
          Tables.events(s, dir), "user_id", "ts", "event_id", gapSeconds = 1800L)
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy("user_id", "session_id"),
      oracle = Some(
        """WITH d AS (
          |  SELECT user_id, event_id, ts,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |g AS (
          |  SELECT user_id, ts,
          |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          |  FROM d)
          |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          |  MIN(ts) AS first_ts, MAX(ts) AS last_ts
          |FROM g GROUP BY user_id, session_id
          |ORDER BY user_id, session_id""".stripMargin),
      doc = "Gap-based row-level session labels (30 min), summarized per session"),

    // Within-session funnel: Sessionize x Funnel composed — the funnel
    // key is (user, session), so a view in one session and a click in the
    // next do NOT convert. The composite key rides through Funnel as a
    // single synthetic column (user_id * 10000 + session_id: session
    // ordinals are gap-bounded far below 10000 per user at any horizon).
    "funnel_in_session" -> QueryDef(
      build = (s, dir) => {
        val labeled = Sessionize.withSessionIds(
          Tables.events(s, dir), "user_id", "ts", "event_id", gapSeconds = 1800L)
          .withColumn("sess_key", col("user_id") * 10000L + col("session_id"))
        Funnel.report(labeled, "sess_key", "event_type", "ts",
            Seq("view", "click", "purchase"))
          .withColumnRenamed("n_users", "n_sessions")
          .withColumnRenamed("sum_uids", "sum_keys")
      },
      oracle = Some(
        """WITH d AS (
          |  SELECT user_id, event_id, event_type, ts,
          |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          |              >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM events),
          |g AS (
          |  SELECT user_id * 10000 + SUM(new_s) OVER (
          |      PARTITION BY user_id ORDER BY ts, event_id
          |      ROWS UNBOUNDED PRECEDING) AS sess_key,
          |    event_type, ts
          |  FROM d),
          |t1 AS (SELECT sess_key, min(ts) AS t1 FROM g
          |  WHERE event_type = 'view' GROUP BY sess_key),
          |t2 AS (
          |  SELECT t1.sess_key, t1.t1, min(e.ts) AS t2
          |  FROM t1 LEFT JOIN g e
          |    ON e.sess_key = t1.sess_key AND e.event_type = 'click' AND e.ts > t1.t1
          |  GROUP BY t1.sess_key, t1.t1),
          |t3 AS (
          |  SELECT t2.sess_key, t2.t2, min(e.ts) AS t3
          |  FROM t2 LEFT JOIN g e
          |    ON e.sess_key = t2.sess_key AND e.event_type = 'purchase' AND e.ts > t2.t2
          |  GROUP BY t2.sess_key, t2.t2)
          |SELECT step, n_sessions, sum_keys FROM (
          |  SELECT '01_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_sessions,
          |    CAST(SUM(sess_key) AS BIGINT) AS sum_keys FROM t1
          |  UNION ALL
          |  SELECT '02_click', CAST(COUNT(*) AS BIGINT),
          |    CAST(SUM(sess_key) AS BIGINT) FROM t2 WHERE t2 IS NOT NULL
          |  UNION ALL
          |  SELECT '03_purchase', CAST(COUNT(*) AS BIGINT),
          |    CAST(SUM(sess_key) AS BIGINT) FROM t3 WHERE t3 IS NOT NULL)
          |ORDER BY step""".stripMargin),
      doc = "Within-session funnel: Sessionize x Funnel on the (user, session) key")
  )
}
