package graft.schema

import org.apache.spark.sql.types._

/** Reference-parity event schemas: `StructType`s for the proto3 messages
  * behind the reference's 10 well-known registry subjects
  * (`service/InitializationService.java:73-110`), mapped per SURVEY §1.2:
  * scalar → matching Spark type, `google.protobuf.Timestamp` →
  * TimestampType, enum → StringType (enum name), nested message → nested
  * StructType, repeated → ArrayType, map → MapType (with
  * `google.protobuf.Value` values JSON-encoded as StringType and
  * `google.protobuf.Any` as (type_url, value BINARY)). All fields nullable —
  * proto3 field presence is optional, and nullable-only fields keep
  * FULL_TRANSITIVE evolution open.
  *
  * Sources: `common.proto:38-49` (EventMetadata), `tenant_events.proto:18-70`,
  * `auth_events.proto:38-102`, `commands.proto:70-125`.
  */
object EventSchemas {

  private def s(pairs: (String, DataType)*): StructType =
    StructType(pairs.map { case (n, t) => StructField(n, t, nullable = true) })

  private val stringMap = MapType(StringType, StringType)
  /** map<string, google.protobuf.Value>: values carried as JSON text. */
  private val valueMap = MapType(StringType, StringType)
  /** google.protobuf.Any: opaque packed message. */
  private val anyType = s("type_url" -> StringType, "value" -> BinaryType)

  /** common.proto:38-49 — embedded in every event. */
  val eventMetadata: StructType = s(
    "event_id" -> StringType, "correlation_id" -> StringType,
    "source_service" -> StringType, "timestamp" -> TimestampType,
    "version" -> IntegerType, "headers" -> stringMap,
    "tenant_id" -> StringType, "user_id" -> StringType,
    "priority" -> StringType, "retry_count" -> IntegerType)

  /** common.proto:80-88. */
  val address: StructType = s(
    "street" -> StringType, "city" -> StringType, "state" -> StringType,
    "postal_code" -> StringType, "country" -> StringType,
    "latitude" -> DoubleType, "longitude" -> DoubleType)

  /** common.proto:91-97. */
  val contactInfo: StructType = s(
    "email" -> StringType, "phone" -> StringType, "mobile" -> StringType,
    "fax" -> StringType, "address" -> address)

  /** tenant_events.proto:18-37. */
  val tenantCreated: StructType = s(
    "metadata" -> eventMetadata,
    "tenant" -> s(
      "tenant_id" -> StringType, "name" -> StringType, "domain" -> StringType,
      "organization_type" -> StringType, "subscription_tier" -> StringType,
      "isolation_strategy" -> StringType, "parent_tenant_id" -> StringType,
      "is_active" -> BooleanType, "created_at" -> TimestampType,
      "contact_info" -> contactInfo, "settings" -> stringMap,
      "enabled_features" -> ArrayType(StringType)))

  /** tenant_events.proto:40-51. */
  val tenantUpdated: StructType = s(
    "metadata" -> eventMetadata,
    "update" -> s(
      "tenant_id" -> StringType, "changed_fields" -> valueMap,
      "updated_by" -> StringType, "updated_at" -> TimestampType))

  /** tenant_events.proto:54-60. */
  val tenantActivated: StructType = s(
    "metadata" -> eventMetadata, "tenant_id" -> StringType,
    "activated_by" -> StringType, "activated_at" -> TimestampType,
    "reason" -> StringType)

  /** tenant_events.proto:63-70. */
  val tenantDeactivated: StructType = s(
    "metadata" -> eventMetadata, "tenant_id" -> StringType,
    "deactivated_by" -> StringType, "deactivated_at" -> TimestampType,
    "reason" -> StringType, "is_temporary" -> BooleanType)

  /** auth_events.proto:38-57. */
  val userLogin: StructType = s(
    "metadata" -> eventMetadata,
    "login" -> s(
      "user_id" -> StringType, "tenant_id" -> StringType,
      "username" -> StringType, "email" -> StringType,
      "authentication_method" -> StringType, "ip_address" -> StringType,
      "user_agent" -> StringType, "session_id" -> StringType,
      "login_time" -> TimestampType, "mfa_used" -> BooleanType,
      "device_id" -> StringType, "additional_info" -> stringMap))

  /** auth_events.proto:60-73. */
  val userLogout: StructType = s(
    "metadata" -> eventMetadata,
    "logout" -> s(
      "user_id" -> StringType, "tenant_id" -> StringType,
      "session_id" -> StringType, "logout_time" -> TimestampType,
      "logout_reason" -> StringType, "session_duration_ms" -> LongType))

  /** auth_events.proto:76-91. */
  val loginFailed: StructType = s(
    "metadata" -> eventMetadata,
    "failure" -> s(
      "username" -> StringType, "tenant_id" -> StringType,
      "failure_reason" -> StringType, "ip_address" -> StringType,
      "user_agent" -> StringType, "attempt_time" -> TimestampType,
      "failure_count" -> IntegerType, "account_locked" -> BooleanType))

  /** auth_events.proto:94-102. */
  val passwordChanged: StructType = s(
    "metadata" -> eventMetadata, "user_id" -> StringType,
    "tenant_id" -> StringType, "changed_by" -> StringType,
    "changed_at" -> TimestampType, "forced_change" -> BooleanType,
    "change_reason" -> StringType)

  /** commands.proto:70-87. */
  val sendNotification: StructType = s(
    "metadata" -> eventMetadata,
    "notification" -> s(
      "recipient_id" -> StringType, "tenant_id" -> StringType,
      "type" -> StringType, "template_id" -> StringType,
      "template_variables" -> stringMap, "subject" -> StringType,
      "body" -> StringType, "priority" -> StringType,
      "channels" -> ArrayType(StringType), "schedule_at" -> TimestampType))

  /** commands.proto:107-125. */
  val auditLog: StructType = s(
    "metadata" -> eventMetadata,
    "entry" -> s(
      "tenant_id" -> StringType, "user_id" -> StringType,
      "action" -> StringType, "resource_type" -> StringType,
      "resource_id" -> StringType, "old_value" -> anyType,
      "new_value" -> anyType, "result" -> StringType,
      "timestamp" -> TimestampType, "ip_address" -> StringType,
      "context" -> stringMap))

  /** The reference's 10 startup-registered subjects, in its registration
    * order (`service/InitializationService.java:73-110`; `<topic>-value`
    * naming per `service/SchemaRegistryService.java:277-299`).
    */
  val wellKnownSubjects: Seq[(String, StructType)] = Seq(
    "nnipa.events.tenant.created-value" -> tenantCreated,
    "nnipa.events.tenant.updated-value" -> tenantUpdated,
    "nnipa.events.tenant.activated-value" -> tenantActivated,
    "nnipa.events.tenant.deactivated-value" -> tenantDeactivated,
    "nnipa.events.auth.login-value" -> userLogin,
    "nnipa.events.auth.logout-value" -> userLogout,
    "nnipa.events.auth.login-failed-value" -> loginFailed,
    "nnipa.events.auth.password-changed-value" -> passwordChanged,
    "nnipa.commands.notification.send-value" -> sendNotification,
    "nnipa.commands.audit.log-value" -> auditLog)

  /** Registers every well-known subject (idempotent — re-registering the
    * latest schema is a registry no-op). Returns the catalog.
    */
  def bootstrap(catalog: SchemaCatalog = new SchemaCatalog): SchemaCatalog = {
    wellKnownSubjects.foreach { case (subject, schema) =>
      catalog.register(subject, schema)
    }
    catalog
  }
}
