package graft.intel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema._

/** Second intel module: storage buckets from a list-buckets-style JSON
  * feed — the reference's S3 module shape (cartography/intel/aws/s3.py:
  * ACL grants exploded per grantee, encryption/versioning flattening,
  * anonymous-access detection driving an extra label, the bucket policy
  * kept as a JSON-string property re-parsed on read — SURVEY §1.2 "nested
  * structures are flattened at transform time").
  *
  * Demonstrates the module contract generalizing past ComputeInstances:
  * grant edges carry properties (permission), the public-bucket label is
  * conditional, and the policy blob round-trips as a string column.
  */
object StorageBuckets extends IntelModule {
  val name = "storage-buckets"

  override val labels: Seq[String] = Seq("Bucket", "Grantee")

  /** Input dicts are schemaless in the reference — the schema selects and
    * renames fields at load time, and missing fields load as null
    * (SURVEY §1.3). Declaring the read schema gives the same semantics
    * here: a feed epoch where no grant carries a URI still parses, with
    * the URI field null, instead of failing schema inference. */
  private val RawSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "Owner STRING, Name STRING, CreationDate STRING, " +
      "Encryption STRUCT<Enabled: BOOLEAN, Algorithm: STRING>, " +
      "Versioning STRING, " +
      "Policy STRUCT<Version: STRING, Id: STRING>, " +
      "Grants ARRAY<STRUCT<Grantee: STRUCT<Id: STRING, URI: STRING, " +
      "Type: STRING>, Permission: STRING>>")

  def extract(spark: SparkSession, source: String): DataFrame =
    spark.read.schema(RawSchema).json(source)

  def transform(raw: DataFrame): Seq[(NodeSchema, DataFrame)] = {
    val buckets = raw.select(
      col("Owner").as("account"),
      col("Name").as("bucket_name"),
      concat(lit("arn:storage:::"), col("Name")).as("arn"),
      to_timestamp(col("CreationDate")).as("created"),
      coalesce(col("Encryption.Enabled"), lit(false)).as("encrypted"),
      col("Encryption.Algorithm").as("encryption_algorithm"),
      (col("Versioning") <=> lit("Enabled")).as("versioned"),
      // anonymous access iff any ACL grant targets the AllUsers group
      // (reference s3.py grant scanning); exists() is codegen'd, no
      // explode. coalesce: a null URI makes contains() null and exists()
      // three-valued-null when nothing matched — absent grants mean NOT
      // public, so fold null to false
      coalesce(exists(col("Grants"), g =>
        g.getField("Grantee").getField("URI").contains("AllUsers")), lit(false))
        .as("anonymous_access"),
      // policy blob stored as a JSON string, parsed on read (SURVEY §1.2)
      to_json(col("Policy")).as("policy_json"),
      col("Grants").as("grants"))

    val grants = buckets.select(col("bucket_name"), explode(col("grants")).as("g"))
      .select(
        coalesce(col("g.Grantee.Id"), col("g.Grantee.URI")).as("grantee_id"),
        col("g.Grantee.Type").as("grantee_type"),
        col("g.Permission").as("permission"),
        col("bucket_name"))

    val bucketSchema = NodeSchema(
      label = "Bucket",
      id = Field("bucket_name"),
      properties = Map(
        "arn" -> Field("arn"),
        "created" -> Field("created"),
        "encrypted" -> Field("encrypted"),
        "encryption_algorithm" -> Field("encryption_algorithm"),
        "versioned" -> Field("versioned"),
        "anonymous_access" -> Field("anonymous_access"),
        "policy_json" -> Field("policy_json")),
      extraLabels = Seq(ExtraLabel("StorageContainer"),
        ExtraLabel.when("PublicBucket", col("anonymous_access"))),
      subResource = Some(SubResourceRel("Account", "id", Field("account"))))

    val granteeSchema = NodeSchema(
      label = "Grantee",
      id = Field("grantee_id"),
      properties = Map("grantee_type" -> Field("grantee_type")),
      otherRels = Seq(RelSchema("HAS_GRANT", "Bucket", targetKey = "id",
        sourceRef = Field("bucket_name"),
        properties = Map("permission" -> Field("permission")))))

    Seq(bucketSchema -> buckets.drop("grants"), granteeSchema -> grants)
  }
}
