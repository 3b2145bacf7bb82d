package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String / identifier scalar functions — the reference's per-module
  * transform helpers re-expressed as codegen'd Column functions
  * (reference: cartography/intel/aws/resourcegroupstaggingapi.py:32-130
  * ARN parsing; cartography/intel/aws/route53.py:44-88 DNS normalization;
  * cartography/util.py:832-924 stringify / camel_to_snake).
  */
object StringFunctions {

  /** ARN format: arn:partition:service:region:account:resource
    * (resource may be "type/id" or "type:id"). */
  def arnService(arn: Column): Column = split(arn, ":").getItem(2)
  def arnAccount(arn: Column): Column = split(arn, ":").getItem(4)

  /** Resource type from the resource part, e.g. "instance" from
    * "...:instance/i-1" (resourcegroupstaggingapi.py:32-130). */
  def arnResourceType(arn: Column): Column =
    regexp_extract(arn, "^arn:[^:]*:[^:]*:[^:]*:[^:]*:([^:/]+)[:/]", 1)

  /** Short id from the resource part, e.g. "i-1" (get_short_id_from_ec2_arn). */
  def arnShortId(arn: Column): Column = {
    val resource = substring_index(arn, ":", -1)
    when(resource.contains("/"), substring_index(resource, "/", -1)).otherwise(resource)
  }

  /** DNS normalization: lowercase + strip trailing dot
    * (route53.py:44-88). */
  def normalizeDns(name: Column): Column = lower(regexp_replace(name, "\\.$", ""))

  /** Composite record id "zone/name/type" (route53.py:118-240). */
  def compositeId(parts: Column*): Column = concat_ws("/", parts: _*)

  /** camel_to_snake property-name mangling — compile-time in the schema
    * DSL, exposed for catalog/docs generation (util.py:908-924). */
  def camelToSnake(s: String): String =
    s.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .toLowerCase

  /** Stringify-preserving-null (util.py:832-854 dict_value_to_str). */
  def valueToString(c: Column): Column = c.cast("string")

  /** Epoch seconds from a date/timestamp (util.py:855-907
    * dict_date_to_epoch). */
  def toEpoch(c: Column): Column = unix_timestamp(c)
}
