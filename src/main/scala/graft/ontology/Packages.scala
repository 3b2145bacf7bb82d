package graft.ontology

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Package identity normalization and canonical Package derivation — the
  * cross-tool package matching layer (reference:
  * cartography/intel/trivy/util.py:13-141 `normalize_package_name` /
  * `parse_purl` / `make_normalized_package_id` /
  * `make_normalized_package_name_id`, and
  * cartography/intel/ontology/packages.py:55-102 `transform_packages`,
  * which groups PackageVersion rows into version-independent Package
  * nodes). All pure Column expressions — the parse rides inside
  * whole-stage codegen, the grouping is one hash aggregation. */
object Packages {

  /** Parse a Package URL (`pkg:type/[namespace/]name@version[?q][#s]`)
    * into `struct(type, namespace, name, version)` — null-filled when
    * the input is null or not a valid purl (reference parse_purl returns
    * None on ValueError; callers fall back to bare name+type).
    * Components are percent-decoded AFTER separator splitting, per the
    * purl spec (so `pkg:npm/%40types/node@18.0.0` yields namespace
    * `@types`); the version is everything after the LAST `@` of the
    * final segment; the type is lowercased. */
  def parsePurl(purl: Column): Column = {
    val core = split(split(coalesce(purl, lit("")), "#", 2).getItem(0),
      "\\?", 2).getItem(0)
    val body = regexp_replace(core, "^pkg:", "")
    val segs = split(body, "/")
    val nseg = size(segs)
    val ptype = lower(element_at(segs, 1))
    val lastRaw = element_at(segs, -1)
    val hasVersion = lastRaw.contains("@")
    val version = when(hasVersion,
      url_decode(regexp_extract(lastRaw, "@([^@]*)$", 1)))
    val name = url_decode(
      when(hasVersion, regexp_extract(lastRaw, "^(.*)@[^@]*$", 1))
        .otherwise(lastRaw))
    val nsJoined = array_join(
      slice(segs, lit(2), greatest(nseg - 2, lit(0))), "/")
    val namespace = when(nsJoined =!= "", url_decode(nsJoined))
    val valid = startswith(core, lit("pkg:")) && nseg >= 2 &&
      ptype =!= "" && name =!= ""
    when(valid, struct(ptype.as("ptype"), namespace.as("namespace"),
      name.as("name"), version.as("version")))
      .otherwise(lit(null).cast(
        "struct<ptype:string,namespace:string,name:string,version:string>"))
  }

  /** Ecosystem-aware name normalization (trivy/util.py:13-34): PEP 503
    * for python ecosystems (lowercase, runs of `[._-]` → one dash),
    * plain lowercase everywhere else. */
  def normalizePackageName(name: Column, ptype: Column): Column = {
    val t = lower(coalesce(ptype, lit("")))
    when(t.isin("python", "pypi", "python-pkg"),
      regexp_replace(lower(name), "[._-]+", "-"))
      .otherwise(lower(name))
  }

  private def idFromParsed(parsed: Column, withVersion: Boolean): Column = {
    val p = parsed
    val norm = normalizePackageName(p.getField("name"), p.getField("ptype"))
    val ns = when(p.getField("namespace").isNotNull,
      concat(p.getField("namespace"), lit("/"))).otherwise(lit(""))
    val base = concat(p.getField("ptype"), lit("|"), ns, norm)
    if (withVersion) concat(base, lit("|"), p.getField("version")) else base
  }

  /** `{type}|{namespace/}{normalized_name}|{version}` — the
    * PackageVersion node id (trivy/util.py:63-105): purl components when
    * a purl parses AND carries name+version, else the bare
    * name/version/type fallback, else null. */
  def normalizedPackageId(purl: Column, name: Column, version: Column,
                          ptype: Column): Column = {
    val p = parsePurl(purl)
    val fromPurl = p.isNotNull && p.getField("name").isNotNull &&
      p.getField("name") =!= "" && p.getField("version").isNotNull
    val fallbackOk = name.isNotNull && version.isNotNull && ptype.isNotNull
    when(fromPurl, idFromParsed(p, withVersion = true))
      .when(fallbackOk, concat(lower(ptype), lit("|"),
        normalizePackageName(name, ptype), lit("|"), version))
  }

  /** `{type}|{namespace/}{normalized_name}` — the versionless canonical
    * Package id (trivy/util.py:107-141): purl-first, bare name+type
    * fallback, null when neither yields a key. */
  def normalizedPackageNameId(purl: Column, name: Column,
                              ptype: Column): Column = {
    val p = parsePurl(purl)
    val fromPurl = p.isNotNull && p.getField("name").isNotNull &&
      p.getField("name") =!= ""
    val fallbackOk = name.isNotNull && ptype.isNotNull
    when(fromPurl, idFromParsed(p, withVersion = false))
      .when(fallbackOk, concat(lower(ptype), lit("|"),
        normalizePackageName(name, ptype)))
  }

  /** Group PackageVersion rows into version-independent canonical
    * Package nodes (packages.py `transform_packages`): rows that yield
    * no versionless key are skipped; the Package's (type, name) come
    * from the key itself; the namespace is the MINIMUM non-null parsed
    * namespace of the group (the reference takes the first-encountered
    * non-None — row-order-dependent on ties; min is the deterministic
    * refinement, and groups mixing distinct namespaces cannot share a
    * key anyway since the namespace is part of it); `version_ids` is the
    * sorted distinct set of member PackageVersion ids. One hash
    * aggregation — no shuffle beyond the groupBy. */
  def packagesFromVersions(versions: DataFrame, purlCol: String = "purl",
                           nameCol: String = "name", typeCol: String = "type",
                           versionIdCol: String = "normalized_id"): DataFrame = {
    // parse once per row; key and namespace both read the same struct
    // (the parse is the regex-heavy part of the per-row cost)
    val parsed = versions.withColumn("_pp", parsePurl(col(purlCol)))
    val fromPurl = col("_pp").isNotNull && col("_pp").getField("name").isNotNull &&
      col("_pp").getField("name") =!= ""
    val fallbackOk = col(nameCol).isNotNull && col(typeCol).isNotNull
    val keyed = parsed
      .withColumn("_pkg_id",
        when(fromPurl, idFromParsed(col("_pp"), withVersion = false))
          .when(fallbackOk, concat(lower(col(typeCol)), lit("|"),
            normalizePackageName(col(nameCol), col(typeCol)))))
      .filter(col("_pkg_id").isNotNull)
      .withColumn("_pkg_ns", col("_pp").getField("namespace"))
    keyed.groupBy(col("_pkg_id").as("id"))
      .agg(min(col("_pkg_ns")).as("namespace"),
        array_sort(collect_set(col(versionIdCol))).as("version_ids"))
      .select(col("id"),
        substring_index(col("id"), "|", 1).as("type"),
        regexp_extract(col("id"), "^[^|]*\\|(.*)$", 1).as("name"),
        col("namespace"), col("version_ids"))
  }
}
