package graft.io

import graft.operators.Envelope
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-subject wire decoders for the reference's 10 startup-registered
  * subjects (`service/InitializationService.java:73-110`): each maps a
  * bare-protobuf `value` column to a typed struct whose schema matches
  * `graft.schema.EventSchemas`' StructType for that subject field for
  * field (WireDecodersSpec pins the equality, ignoring nullability) — so
  * a reference consumer's decode step ports as
  * `df.select(WireDecoders.forSubject(subj)(col("value")))` with no
  * spark-protobuf dependency. Field numbers are cited from the proto
  * sources in the reference jar.
  *
  * Enum fields carry the enum NAME (the reference stringifies them the
  * same way); `map<string, google.protobuf.Value>` fields carry values as
  * JSON text; `google.protobuf.Any` as (type_url, value bytes) — all per
  * the SURVEY §1.2 type mapping. Sessions must call
  * `graft.functions.Hashing.register` first.
  */
object WireDecoders {

  private def s(v: Column, p: String) = call_function("graft_proto_string", v, lit(p))
  private def l(v: Column, p: String) = call_function("graft_proto_long", v, lit(p))
  private def i32(v: Column, p: String) = l(v, p).cast("int")
  private def bool(v: Column, p: String) = l(v, p) =!= 0L
  private def dbl(v: Column, p: String) = call_function("graft_proto_double", v, lit(p))
  private def ts(v: Column, p: String) = call_function("graft_proto_timestamp", v, lit(p))
  private def strMap(v: Column, p: String) = call_function("graft_proto_string_map", v, lit(p))
  private def strList(v: Column, p: String) = call_function("graft_proto_string_list", v, lit(p))
  private def valueMap(v: Column, p: String) = call_function("graft_proto_json_value_map", v, lit(p))
  private def bin(v: Column, p: String) = call_function("graft_proto_bytes", v, lit(p))

  private def enumName(v: Column, p: String, names: Seq[String]): Column =
    names.zipWithIndex.foldLeft(lit(names.head)) { case (acc, (n, i)) =>
      when(l(v, p) === i.toLong, lit(n)).otherwise(acc)
    }

  /** common.proto:100-131 enum name tables. */
  private val orgTypes = Seq("UNSPECIFIED", "GOVERNMENT_AGENCY", "CORPORATION",
    "ACADEMIC_INSTITUTION", "HEALTHCARE", "FINANCIAL_INSTITUTION", "NON_PROFIT",
    "STARTUP", "RESEARCH", "INDIVIDUAL").map("ORGANIZATION_TYPE_" + _)
  private val tiers = Seq("UNSPECIFIED", "FREE", "BASIC", "PROFESSIONAL",
    "ENTERPRISE", "GOVERNMENT").map("TIER_" + _)
  private val isolations = Seq("UNSPECIFIED", "SHARED_DATABASE",
    "SCHEMA_ISOLATION", "DATABASE_ISOLATION", "HYBRID",
    "PHYSICAL_ISOLATION").map("ISOLATION_" + _)

  /** common.proto:80-88 Address at `p`. */
  private def address(v: Column, p: String): Column = struct(
    s(v, s"$p.1").as("street"), s(v, s"$p.2").as("city"),
    s(v, s"$p.3").as("state"), s(v, s"$p.4").as("postal_code"),
    s(v, s"$p.5").as("country"),
    dbl(v, s"$p.6").as("latitude"), dbl(v, s"$p.7").as("longitude"))

  /** common.proto:91-97 ContactInfo at `p`. */
  private def contactInfo(v: Column, p: String): Column = struct(
    s(v, s"$p.1").as("email"), s(v, s"$p.2").as("phone"),
    s(v, s"$p.3").as("mobile"), s(v, s"$p.4").as("fax"),
    address(v, s"$p.5").as("address"))

  /** common.proto:135-139 google.protobuf.Any at `p`. */
  private def anyField(v: Column, p: String): Column = struct(
    s(v, s"$p.1").as("type_url"), bin(v, s"$p.2").as("value"))

  private def metadata(v: Column): Column =
    KafkaIO.decodeEventMetadata(v).as("metadata")

  /** The 10 well-known subjects → decoder (subject naming per
    * `service/SchemaRegistryService.java:277-299`).
    */
  val decoders: Map[String, Column => Column] = Map(
    // tenant_events.proto:18-37
    "nnipa.events.tenant.created-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("tenant_id"), s(v, "2.2").as("name"),
        s(v, "2.3").as("domain"),
        enumName(v, "2.4", orgTypes).as("organization_type"),
        enumName(v, "2.5", tiers).as("subscription_tier"),
        enumName(v, "2.6", isolations).as("isolation_strategy"),
        s(v, "2.7").as("parent_tenant_id"), bool(v, "2.8").as("is_active"),
        ts(v, "2.9").as("created_at"),
        contactInfo(v, "2.10").as("contact_info"),
        strMap(v, "2.11").as("settings"),
        strList(v, "2.12").as("enabled_features")).as("tenant"))),
    // tenant_events.proto:40-51
    "nnipa.events.tenant.updated-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("tenant_id"),
        valueMap(v, "2.2").as("changed_fields"),
        s(v, "2.3").as("updated_by"),
        ts(v, "2.4").as("updated_at")).as("update"))),
    // tenant_events.proto:54-60
    "nnipa.events.tenant.activated-value" -> (v => struct(metadata(v),
      s(v, "2").as("tenant_id"), s(v, "3").as("activated_by"),
      ts(v, "4").as("activated_at"), s(v, "5").as("reason"))),
    // tenant_events.proto:63-70
    "nnipa.events.tenant.deactivated-value" -> (v => struct(metadata(v),
      s(v, "2").as("tenant_id"), s(v, "3").as("deactivated_by"),
      ts(v, "4").as("deactivated_at"), s(v, "5").as("reason"),
      bool(v, "6").as("is_temporary"))),
    // auth_events.proto:38-57
    "nnipa.events.auth.login-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("user_id"), s(v, "2.2").as("tenant_id"),
        s(v, "2.3").as("username"), s(v, "2.4").as("email"),
        s(v, "2.5").as("authentication_method"), s(v, "2.6").as("ip_address"),
        s(v, "2.7").as("user_agent"), s(v, "2.8").as("session_id"),
        ts(v, "2.9").as("login_time"), bool(v, "2.10").as("mfa_used"),
        s(v, "2.11").as("device_id"),
        strMap(v, "2.12").as("additional_info")).as("login"))),
    // auth_events.proto:60-73
    "nnipa.events.auth.logout-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("user_id"), s(v, "2.2").as("tenant_id"),
        s(v, "2.3").as("session_id"), ts(v, "2.4").as("logout_time"),
        s(v, "2.5").as("logout_reason"),
        l(v, "2.6").as("session_duration_ms")).as("logout"))),
    // auth_events.proto:76-91
    "nnipa.events.auth.login-failed-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("username"), s(v, "2.2").as("tenant_id"),
        s(v, "2.3").as("failure_reason"), s(v, "2.4").as("ip_address"),
        s(v, "2.5").as("user_agent"), ts(v, "2.6").as("attempt_time"),
        i32(v, "2.7").as("failure_count"),
        bool(v, "2.8").as("account_locked")).as("failure"))),
    // auth_events.proto:94-102
    "nnipa.events.auth.password-changed-value" -> (v => struct(metadata(v),
      s(v, "2").as("user_id"), s(v, "3").as("tenant_id"),
      s(v, "4").as("changed_by"), ts(v, "5").as("changed_at"),
      bool(v, "6").as("forced_change"), s(v, "7").as("change_reason"))),
    // commands.proto:70-87
    "nnipa.commands.notification.send-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("recipient_id"), s(v, "2.2").as("tenant_id"),
        s(v, "2.3").as("type"), s(v, "2.4").as("template_id"),
        strMap(v, "2.5").as("template_variables"), s(v, "2.6").as("subject"),
        s(v, "2.7").as("body"),
        enumName(v, "2.8", Envelope.priorities).as("priority"),
        strList(v, "2.9").as("channels"),
        ts(v, "2.10").as("schedule_at")).as("notification"))),
    // commands.proto:107-125
    "nnipa.commands.audit.log-value" -> (v => struct(metadata(v),
      struct(
        s(v, "2.1").as("tenant_id"), s(v, "2.2").as("user_id"),
        s(v, "2.3").as("action"), s(v, "2.4").as("resource_type"),
        s(v, "2.5").as("resource_id"),
        anyField(v, "2.6").as("old_value"), anyField(v, "2.7").as("new_value"),
        s(v, "2.8").as("result"), ts(v, "2.9").as("timestamp"),
        s(v, "2.10").as("ip_address"),
        strMap(v, "2.11").as("context")).as("entry"))))

  /** Decoder for a registered subject (throws on unknown — same contract
    * as a registry lookup).
    */
  def forSubject(subject: String): Column => Column =
    decoders.getOrElse(subject,
      throw new IllegalArgumentException(s"no wire decoder for subject $subject"))
}
