package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Network-address joins over integer-encoded IPv4 space.
  *
  * The reference's graph is full of network scoping (security groups,
  * route tables, DNS zones; cartography's AWS modules attach instances
  * to subnets by exactly this containment relation) — here expressed as
  * the bucketed range join the engine uses everywhere: candidates from
  * an EQUI-join on coarse /16 buckets, exactness from a residual mask
  * filter, never |ips| × |networks|.
  */
object Network {

  /** IP-in-CIDR containment join: ips (id, ip) — ip as an unsigned-ish
    * long in [0, 2^32) — against networks (net_id, base, prefix_len),
    * matching where `base <= ip < base + 2^(32-prefix_len)`.
    *
    * Every network explodes to the /16 buckets it covers (one bucket
    * when prefix_len >= 16, 2^(16-prefix_len) when shorter — bounded by
    * the prefix_len >= 8 guard at 256), each ip carries its single
    * bucket, and the equi-join + residual range filter is exact. A
    * network shorter than /8 belongs in a broadcast list, not this
    * join — rejected loudly. Output: (id, ip, net_id, base, prefix_len). */
  def cidrContainJoin(ips: DataFrame, nets: DataFrame): DataFrame = {
    val n = nets.select(col("net_id"), col("base").cast("long").as("base"),
        col("prefix_len").cast("int").as("prefix_len"))
      .withColumn("prefix_len", when(col("prefix_len") < 8 || col("prefix_len") > 32,
        expr("raise_error('cidrContainJoin: prefix_len must be in [8, 32] - " +
          "broadcast shorter prefixes as a literal list')"))
        .otherwise(col("prefix_len")))
      .withColumn("span", expr("shiftleft(1L, 32 - prefix_len)"))
      .withColumn("bkt", explode(expr(
        "sequence(base div 65536, (base + span - 1) div 65536)")))
    val i = ips.select(col("id"), col("ip").cast("long").as("ip"))
      .withColumn("bkt", expr("ip div 65536"))
    i.join(n, Seq("bkt"))
      .filter(col("ip") >= col("base") && col("ip") < col("base") + col("span"))
      .select(col("id"), col("ip"), col("net_id"), col("base"), col("prefix_len"))
  }
}
