package graft.intel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema._

/** Example intel module: compute instances from a paginated
  * describe-instances-style JSON feed — the canonical "richest transform"
  * module (reference: cartography/intel/aws/ec2/instances.py:111-297
  * transform_ec2_instances; fixture shape per FIXTURES.md fixture 1).
  *
  * The reference flattens reservations → instances → NICs in Python dict
  * loops; here the same derivations are declarative columns: nested-array
  * `explode`, ARN synthesis with `concat`, IMDS normalization with
  * `when/otherwise`, tag extraction with a higher-order `filter` — all of
  * it whole-stage codegen, no UDFs, and Catalyst prunes the raw JSON
  * struct down to the referenced fields.
  */
object ComputeInstances extends IntelModule {
  val name = "compute-instances"

  override val labels: Seq[String] = Seq("Instance", "Nic")

  /** Get: JSON lines, one reservation per line (spark.read.json is the
    * file-source analog of the API paginator; a live connector would fetch
    * pages into the same shape). */
  def extract(spark: SparkSession, source: String): DataFrame =
    spark.read.json(source)

  def transform(raw: DataFrame): Seq[(NodeSchema, DataFrame)] = {
    val instances = raw.select(
      col("OwnerId").as("account"),
      col("ReservationId").as("reservation"),
      explode(col("Instances")).as("inst"))
      .select(
        col("account"), col("reservation"),
        col("inst.InstanceId").as("instance_id"),
        col("inst.Type").as("instance_type"),
        col("inst.State").as("state"),
        to_timestamp(col("inst.LaunchTime")).as("launch_time"),
        // ARN synthesis (reference instances.py:163-199)
        concat(lit("arn:compute:"), col("account"), lit(":instance/"),
          col("inst.InstanceId")).as("arn"),
        // IMDS normalization (reference _transform_metadata_options :72-92)
        (col("inst.MetadataOptions.HttpTokens") <=> lit("optional"))
          .as("allows_imdsv1"),
        // tag-based cluster extraction (reference _get_eks_cluster_name :53-69);
        // try_element_at: absent tag → null (ANSI element_at throws on empty)
        try_element_at(filter(col("inst.Tags"),
          t => t.getField("Key") === "team"), lit(1)).getField("Value").as("team"),
        col("inst.Nics").as("nics"))

    val nics = instances.select(
      col("instance_id"),
      explode(col("nics")).as("nic"))
      .select(
        col("nic.NicId").as("nic_id"),
        col("nic.SubnetId").as("subnet_id"),
        col("instance_id"))

    val instanceSchema = NodeSchema(
      label = "Instance",
      id = Field("instance_id"),
      properties = Map(
        "instance_type" -> Field("instance_type"),
        "state" -> Field("state"),
        "launch_time" -> Field("launch_time"),
        "arn" -> Field("arn"),
        "allows_imdsv1" -> Field("allows_imdsv1"),
        "team" -> Field("team"),
        "reservation" -> Field("reservation")),
      extraLabels = Seq(ExtraLabel("ComputeInstance"),
        ExtraLabel.when("Imdsv1Risk", col("allows_imdsv1"))),
      subResource = Some(SubResourceRel("Account", "id", Field("account"))))

    val nicSchema = NodeSchema(
      label = "Nic",
      id = Field("nic_id"),
      properties = Map("subnet_id" -> Field("subnet_id")),
      otherRels = Seq(RelSchema("ATTACHED_TO", "Instance", targetKey = "id",
        sourceRef = Field("instance_id"))))

    Seq(instanceSchema -> instances.drop("nics"), nicSchema -> nics)
  }
}
