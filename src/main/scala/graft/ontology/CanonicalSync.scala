package graft.ontology

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Mappings.ModuleMapping

/** The canonical-node side of the ontology sync (the reference's
  * `intel/ontology` package): source-of-truth selection, per-FIELD
  * cross-source merge, and the mutual-unique candidate linker used by
  * its linking jobs.
  *
  * [[sourceNodes]] mirrors `get_source_nodes_from_graph`
  * (cartography/intel/ontology/utils.py:85-153) — which is a DIFFERENT
  * merge than [[Materialize]]'s whole-row winner: the reference reads the
  * mapping as a field-NAME translation over the RAW provider columns (no
  * strategy application — strategies only run at load-time `_ont_*`
  * stamping via querybuilder), drops rows whose required field is falsy,
  * and backfills each canonical field with the first non-null value in
  * source order (utils.py:71-77). Canonical User/Device/Package/PublicIP
  * nodes are built from THIS merge (users.py:19-40). */
object CanonicalSync {

  /** Legacy source-name aliases (utils.py:14-16). */
  val SourceAliases: Map[String, String] = Map("entra" -> "microsoft")

  /** Trim, alias, drop empties and duplicates — order-preserving
    * (utils.py:19-26 `normalize_source_of_truth`). */
  def normalizeSources(sourceOfTruth: Seq[String]): Seq[String] =
    sourceOfTruth.map(s => SourceAliases.getOrElse(s.trim, s.trim))
      .filter(_.nonEmpty).distinct

  /** Python truthiness for the required-field gate (utils.py:48-56
    * `if field.required and not value`): null and empty string are
    * falsy. The corpus only marks STRING fields required (email, title);
    * a required boolean false / numeric 0 — falsy in Python, truthy
    * here — does not occur in any of the 41 mapping files
    * (MappingCorpusSpec would catch one appearing). */
  private def truthy(c: Column): Column =
    c.isNotNull && c.cast("string") =!= ""

  /** The pseudo-module key marking a category's canonical-side read
    * (utils.py:112-115; users.py:6-33 is the one corpus instance). */
  val OntologyModuleKey = "ontology"

  /** Build the canonical node table for one ONTOLOGY_NODES_MAPPING
    * category: select modules by registry key (empty `sourceOfTruth` =
    * all, in registration order — utils.py:108-110), skip enrich-only
    * mappings, translate field NAMES over the raw provider columns
    * (absent columns read null — the composite-node pattern), drop rows
    * whose required fields are falsy, then merge per canonical id with
    * FIELD-LEVEL first-non-null in (read position, provider node id)
    * order — the deterministic refinement of the reference's
    * encounter-order dict merge. Returns one row per id with every
    * ontology field of the category. Plan: one union, one hash-agg pass
    * over the id partitioning — same shuffle count as Materialize.
    *
    * When the category carries the `"ontology"` pseudo-module
    * (utils.py:112-135 `_has_ontology`), the canonical-side nodes are
    * ALSO read — one read per (eligible node, source), node-major,
    * filtered to `_ont_source = source` over the `canonical` frames and
    * merged AHEAD of every provider read (the reference runs those
    * queries first, so its encounter-order dict prefers them). A source
    * with no provider module is then skipped silently rather than
    * warned about (utils.py:133-140) — for the `users` category, whose
    * ONLY module is the pseudo-module, the canonical reads are the
    * whole sync. An explicitly-selected `"ontology"` source (or the
    * empty-sot default, which includes every registry key) additionally
    * reads the canonical labels UNFILTERED through the provider loop,
    * exactly like the reference's un-parameterized `MATCH (n:label)`. */
  def sourceNodes(modules: Seq[ModuleMapping], provider: Map[String, DataFrame],
                  idField: String, sourceOfTruth: Seq[String] = Nil,
                  srcIdCol: String = "id",
                  canonical: Map[String, DataFrame] = Map.empty,
                  ontSourceCol: String = "_ont_source"): DataFrame = {
    val normalized = normalizeSources(sourceOfTruth)
    val sources =
      if (normalized.nonEmpty) normalized else modules.map(_.key).distinct
    val ontologyModule = modules.find(_.key == OntologyModuleKey)
    val selected = sources.flatMap(s => modules.filter(_.key == s))
    val allFields = modules.flatMap(_.nodes).flatMap(_.fields)
      .map(_.ontologyField).distinct
    require(allFields.contains(idField),
      s"id field '$idField' is not an ontology field of this category")
    // (frame, node mapping, merge priority) — ontology-side reads first
    val ontReads = ontologyModule.toSeq.flatMap { m =>
      val eligible = m.nodes.filter(_.eligibleForSource)
      for {
        (node, ni) <- eligible.zipWithIndex
        (source, si) <- sources.zipWithIndex
      } yield {
        require(canonical.contains(node.nodeLabel),
          s"category carries the ontology pseudo-module: pass a canonical " +
            s"frame for '${node.nodeLabel}'")
        (canonical(node.nodeLabel)
          .filter(col(ontSourceCol) === source), node,
          ni * sources.size + si)
      }
    }
    val provReads = for {
      (m, p) <- selected.zipWithIndex
      node <- m.nodes if node.eligibleForSource
    } yield {
      val df = if (m.key == OntologyModuleKey) {
        require(canonical.contains(node.nodeLabel),
          s"'$OntologyModuleKey' is selected as a source: pass a canonical " +
            s"frame for '${node.nodeLabel}'")
        canonical(node.nodeLabel)
      } else provider(node.nodeLabel)
      (df, node, ontReads.size + p)
    }
    val reads = ontReads ++ provReads
    require(reads.nonEmpty, s"no modules selected from $sourceOfTruth")
    val projected = reads.map { case (df, node, p) =>
      val have = df.columns.toSet
      def raw(nodeField: String): Column =
        if (have(nodeField)) col(nodeField) else lit(null)
      val gate = node.fields.filter(_.required).map(f => truthy(raw(f.nodeField)))
        .reduceOption(_ && _).getOrElse(lit(true))
      val byOnt = node.fields.map(f => f.ontologyField -> raw(f.nodeField)).toMap
      df.filter(gate).select(
        allFields.map(f => byOnt.getOrElse(f, lit(null)).as(s"_f_$f")) ++
          Seq(lit(p).as("_prio"), col(srcIdCol).cast("string").as("_sid")): _*)
    }
    val all = projected.reduce(_ unionByName _)
      .filter(col(s"_f_$idField").isNotNull)
    // per-field first-non-null as ONE hash aggregation, not a window:
    // min over (prio, sid, value) structs with null values nulled out is
    // exactly "first non-null in (source, src-id) order" ((prio, sid) is
    // unique per row, so the value never decides the ordering), and the
    // partial aggregation combines map-side — a canonical id shared by
    // millions of provider rows (one admin email across every tool, the
    // guaranteed-at-scale hot key) reduces per input partition instead
    // of landing on a single window task. Measured in ScaleSmoke
    // (source_nodes_hot: every row one email, wall flat as rows × 10).
    val mergers = allFields.filterNot(_ == idField).map { f =>
      min(when(col(s"_f_$f").isNotNull,
        struct(col("_prio").as("p"), col("_sid").as("s"),
          col(s"_f_$f").as("v")))).getField("v").as(f)
    }
    if (mergers.isEmpty)
      all.select(col(s"_f_$idField").as(idField)).distinct()
    else
      all.groupBy(col(s"_f_$idField").as(idField))
        .agg(mergers.head, mergers.tail: _*)
        .select(allFields.map(col): _*)
  }

  /** Whole-relation uniqueness probe: true iff the column's non-null
    * values are all distinct. One 1-row aggregate collect — the same
    * bounded count-probe the reference issues before each hostname
    * matchlink (devices.py:55-97: `count(DISTINCT x) = count(x)` on both
    * sides). */
  def allValuesUnique(df: DataFrame, column: String): Boolean = {
    val r = df.filter(col(column).isNotNull)
      .agg(count_distinct(col(column)).as("d"), count(lit(1)).as("t")).head()
    r.getLong(0) == r.getLong(1)
  }

  /** Guarded hostname matchlinks (devices.py:113-141): for each target
    * label, link devices to targets by hostname equality ONLY when
    * hostnames are unique on BOTH sides — duplicate hostnames on either
    * side would mass-mislink, so the whole matchlink for that label is
    * skipped (not filtered row-wise; the reference's fallback-matching
    * safety contract). Returns (targetLabel, guardPassed, linkFrame) —
    * the frame is empty when the guard failed. */
  def guardedHostnameLinks(devices: DataFrame, hostnameCol: String,
      targets: Seq[(String, DataFrame, String)])
      : Seq[(String, Boolean, DataFrame)] = {
    val dev = devices.filter(col(hostnameCol).isNotNull)
    val devUnique = allValuesUnique(dev, hostnameCol)
    targets.map { case (label, t, field) =>
      val tt = t.filter(col(field).isNotNull)
      val ok = devUnique && allValuesUnique(tt, field)
      val links =
        if (ok) dev.select(col(hostnameCol).as("hostname"))
          .join(tt, col("hostname") === col(field))
        else dev.sparkSession.emptyDataFrame
      (label, ok, links)
    }
  }

  /** Mutual-unique candidate linking: keep a (src, dst) candidate pair
    * only when the src has EXACTLY ONE distinct candidate dst AND that
    * dst has exactly one distinct candidate src — the reference's
    * device↔instance linking contract ("WITH device, collect(DISTINCT
    * instance) AS c WHERE size(c) = 1" both ways,
    * cartography/analysis/ontology/analysis.py:398-460, also the
    * single-direction variant in CONTAINER/FUNCTION_RESOLVED_IMAGE).
    * Ambiguous evidence must produce NO edge, not a guessed one.
    * Implemented as two window counts over the deduped candidate set —
    * two shuffles, no self-join, no collect. */
  def mutualUniqueLink(candidates: DataFrame, srcCol: String,
                       dstCol: String): DataFrame = {
    val pairs = candidates.select(col(srcCol), col(dstCol)).distinct()
    pairs
      .withColumn("_nd", count(lit(1)).over(Window.partitionBy(col(srcCol))))
      .withColumn("_ns", count(lit(1)).over(Window.partitionBy(col(dstCol))))
      .filter(col("_nd") === 1 && col("_ns") === 1)
      .drop("_nd", "_ns")
  }
}
