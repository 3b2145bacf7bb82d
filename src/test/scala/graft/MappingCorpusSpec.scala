package graft

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.ontology.MappingCorpus
import graft.ontology.Mappings.{FieldMapping, ModuleMapping, NodeMapping}

/** Fidelity gate for the ported ontology mapping corpus: re-derives every
  * category from the REFERENCE TEXT (the 41 files under
  * cartography/models/ontology/mapping/data/) with an independent
  * Python-literal parser and diffs it
  * structurally against [[MappingCorpus.all]] — module registration order
  * and keys, module names, node labels, eligible_for_source, and every
  * field's (ontology_field, node_field, required, special_handling,
  * extra value/values/map/fields, indexed). The corpus Scala is GENERATED
  * by tools/gen_mapping_corpus.py (which imports the reference modules);
  * this spec is a second, text-level rail — a bug in either the generator
  * or the parser shows up as a diff, so the 9k-line corpus cannot drift
  * silently. Skips when the reference tree is absent.
  */
class MappingCorpusSpec extends AnyFunSuite {

  private val dataDir =
    Paths.get("/root/reference/cartography/models/ontology/mapping/data")
  private val registryFile =
    Paths.get("/root/reference/cartography/models/ontology/mapping/__init__.py")

  // ---------------------------------------------------------------- parser

  /** Minimal Python-literal parser for the mapping data files' subset:
    * double-quoted strings, ints, True/False/None, names, lists, dicts
    * (insertion-ordered, with `**name` spread), keyword-arg calls, and
    * top-level `NAME[: annotation] = expr` assignments. Comments and
    * import statements are skipped. Fails loudly on anything else. */
  private object Py {
    sealed trait V
    case class S(s: String) extends V
    case class B(b: Boolean) extends V
    case class I(i: Long) extends V
    case object Null extends V
    case class L(items: Vector[V]) extends V
    case class D(items: Vector[(V, V)]) extends V
    case class Call(name: String, args: Vector[V], kwargs: Vector[(String, V)]) extends V

    sealed trait Tok
    case class TStr(s: String) extends Tok
    case class TNum(s: String) extends Tok
    case class TId(s: String) extends Tok
    case class TP(s: String) extends Tok
    case object TNl extends Tok // newline at bracket depth 0 = statement end

    def tokenize(src: String): Vector[Tok] = {
      val out = Vector.newBuilder[Tok]
      var i = 0; var depth = 0
      val n = src.length
      while (i < n) {
        val c = src(i)
        if (c == '#') { while (i < n && src(i) != '\n') i += 1 }
        else if (c == '\n') { if (depth == 0) out += TNl; i += 1 }
        else if (c.isWhitespace) i += 1
        else if (c == '"') {
          val sb = new StringBuilder; i += 1
          while (i < n && src(i) != '"') {
            require(src(i) != '\\', s"string escapes unsupported at $i")
            sb += src(i); i += 1
          }
          require(i < n, "unterminated string")
          i += 1; out += TStr(sb.toString)
        }
        else if (c.isDigit || (c == '-' && i + 1 < n && src(i + 1).isDigit)) {
          val st = i; i += 1
          while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
          out += TNum(src.substring(st, i))
        }
        else if (c.isLetter || c == '_') {
          val st = i
          while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
          out += TId(src.substring(st, i))
        }
        else if (c == '*' && i + 1 < n && src(i + 1) == '*') { out += TP("**"); i += 2 }
        else {
          if (c == '(' || c == '[' || c == '{') depth += 1
          if (c == ')' || c == ']' || c == '}') depth -= 1
          out += TP(c.toString); i += 1
        }
      }
      out += TNl
      out.result()
    }

    /** Parse a whole file: ordered map of top-level assignments. */
    def parseFile(src: String): mutable.LinkedHashMap[String, V] = {
      val toks = tokenize(src)
      val env = mutable.LinkedHashMap.empty[String, V]
      var i = 0
      def cur: Tok = toks(i)

      def parseExpr(): V = cur match {
        case TStr(s) => i += 1; S(s)
        case TNum(s) => i += 1; I(s.toLong)
        case TId("True")  => i += 1; B(true)
        case TId("False") => i += 1; B(false)
        case TId("None")  => i += 1; Null
        case TId(name) =>
          i += 1
          if (cur == TP("(")) { // call
            i += 1
            val args = Vector.newBuilder[V]
            val kwargs = Vector.newBuilder[(String, V)]
            while (cur != TP(")")) {
              (cur, toks(i + 1)) match {
                case (TId(k), TP("=")) =>
                  i += 2; kwargs += (k -> parseExpr())
                case _ => args += parseExpr()
              }
              if (cur == TP(",")) i += 1
            }
            i += 1
            Call(name, args.result(), kwargs.result())
          } else env.getOrElse(name, sys.error(s"unresolved name $name"))
        case TP("[") =>
          i += 1
          val items = Vector.newBuilder[V]
          while (cur != TP("]")) {
            items += parseExpr()
            if (cur == TP(",")) i += 1
          }
          i += 1; L(items.result())
        case TP("{") =>
          i += 1
          val items = Vector.newBuilder[(V, V)]
          while (cur != TP("}")) {
            if (cur == TP("**")) {
              i += 1
              val spread = parseExpr() match {
                case D(kvs) => kvs
                case other  => sys.error(s"spread of non-dict $other")
              }
              items ++= spread
            } else {
              val k = parseExpr()
              require(cur == TP(":"), s"expected : got $cur"); i += 1
              items += (k -> parseExpr())
            }
            if (cur == TP(",")) i += 1
          }
          i += 1; D(items.result())
        case other => sys.error(s"unexpected token $other")
      }

      while (i < toks.length) {
        cur match {
          case TNl => i += 1
          case TId("from") | TId("import") =>
            while (cur != TNl) i += 1
          case TId(name) =>
            i += 1
            if (cur == TP(":")) { while (cur != TP("=")) i += 1 } // annotation
            require(cur == TP("="), s"expected = after $name, got $cur")
            i += 1
            env(name) = parseExpr()
            require(cur == TNl, s"trailing tokens after $name: $cur")
          case other => sys.error(s"unexpected statement start $other")
        }
      }
      env
    }
  }

  // ----------------------------------------------- dataclass call → Scala

  private def str(v: Py.V): String = v match {
    case Py.S(s) => s
    case other   => sys.error(s"expected string, got $other")
  }

  private def toField(v: Py.V): FieldMapping = v match {
    case Py.Call("OntologyFieldMapping", Vector(), kw) =>
      val m = kw.toMap
      require(kw.map(_._1).distinct.size == kw.size, "duplicate kwargs")
      val known = Set("ontology_field", "node_field", "required",
        "special_handling", "extra", "indexed")
      val unknown = m.keySet -- known
      require(unknown.isEmpty, s"unknown field kwargs $unknown")
      val extra = m.get("extra") match {
        case Some(Py.D(kvs)) => kvs.map { case (k, x) => str(k) -> x }.toMap
        case None            => Map.empty[String, Py.V]
        case other           => sys.error(s"bad extra $other")
      }
      FieldMapping(
        ontologyField = str(m("ontology_field")),
        nodeField = m.get("node_field").map(str).getOrElse(""),
        required = m.get("required").contains(Py.B(true)),
        specialHandling = m.get("special_handling").map(str),
        extraValue = extra.get("value").map {
          case Py.S(s) => s
          case Py.B(b) => b
          case Py.I(i) => i
          case other   => sys.error(s"bad static value $other")
        },
        extraValues = extra.get("values") match {
          case Some(Py.L(xs)) => xs.map(str)
          case None           => Nil
          case other          => sys.error(s"bad values $other")
        },
        extraMap = extra.get("map") match {
          case Some(Py.D(kvs)) => kvs.map { case (k, x) => str(k) -> str(x) }.toMap
          case None            => Map.empty
          case other           => sys.error(s"bad map $other")
        },
        extraFields = extra.get("fields") match {
          case Some(Py.L(xs)) => xs.map(str)
          case None           => Nil
          case other          => sys.error(s"bad fields $other")
        },
        indexed = !m.get("indexed").contains(Py.B(false)))
    case other => sys.error(s"expected OntologyFieldMapping, got $other")
  }

  private def toNode(v: Py.V): NodeMapping = v match {
    case Py.Call("OntologyNodeMapping", Vector(), kw) =>
      val m = kw.toMap
      val unknown = m.keySet -- Set("node_label", "fields", "eligible_for_source")
      require(unknown.isEmpty, s"unknown node kwargs $unknown")
      NodeMapping(
        nodeLabel = str(m("node_label")),
        fields = m("fields") match {
          case Py.L(xs) => xs.map(toField)
          case other    => sys.error(s"bad fields list $other")
        },
        eligibleForSource = !m.get("eligible_for_source").contains(Py.B(false)))
    case other => sys.error(s"expected OntologyNodeMapping, got $other")
  }

  private def toModules(reg: Py.V): Seq[ModuleMapping] = reg match {
    case Py.D(kvs) => kvs.map { case (k, v) =>
      val key = str(k)
      v match {
        case Py.Call("OntologyMapping", Vector(), kw) =>
          val m = kw.toMap
          val unknown = m.keySet -- Set("module_name", "nodes")
          require(unknown.isEmpty, s"unknown module kwargs $unknown")
          val name = str(m("module_name"))
          ModuleMapping(
            moduleName = name,
            nodes = m("nodes") match {
              case Py.L(xs) => xs.map(toNode)
              case other    => sys.error(s"bad nodes list $other")
            },
            registryKey = if (key == name) "" else key)
        case other => sys.error(s"expected OntologyMapping, got $other")
      }
    }
    case other => sys.error(s"expected registration dict, got $other")
  }

  /** Parse one data file → (registration-order modules). */
  private def parseCategory(p: Path): Seq[ModuleMapping] = {
    val env = Py.parseFile(new String(Files.readAllBytes(p), "UTF-8"))
    val regs = env.filter(_._1.endsWith("_ONTOLOGY_MAPPING"))
    require(regs.size == 1, s"${p.getFileName}: ${regs.size} registration dicts")
    toModules(regs.head._2)
  }

  private def available: Boolean = Files.isDirectory(dataDir)

  // ------------------------------------------------------------- the gate

  test("every reference mapping data file is ported, none invented") {
    assume(available)
    val refCats = Files.list(dataDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".py") && n != "__init__.py")
      .map(_.stripSuffix(".py")).toSet
    assert(MappingCorpus.all.keySet == refCats)
  }

  test("ported corpus structurally equals the reference text, category by category") {
    assume(available)
    for ((cat, ours) <- MappingCorpus.all) {
      val ref = parseCategory(dataDir.resolve(s"$cat.py"))
      assert(ours.size == ref.size, s"$cat: module count")
      ours.zip(ref).foreach { case (o, r) =>
        assert(o.key == r.key, s"$cat: registration key order")
        assert(o.moduleName == r.moduleName, s"$cat/${r.key}: module name")
        assert(o.nodes.size == r.nodes.size, s"$cat/${r.key}: node count")
        o.nodes.zip(r.nodes).foreach { case (on, rn) =>
          assert(on.nodeLabel == rn.nodeLabel, s"$cat/${r.key}: node label order")
          assert(on.eligibleForSource == rn.eligibleForSource,
            s"$cat/${r.key}/${rn.nodeLabel}: eligible_for_source")
          assert(on.fields.size == rn.fields.size,
            s"$cat/${r.key}/${rn.nodeLabel}: field count " +
              s"(ours ${on.fields.map(_.ontologyField)} ref ${rn.fields.map(_.ontologyField)})")
          on.fields.zip(rn.fields).foreach { case (of, rf) =>
            assert(of == rf, s"$cat/${r.key}/${rn.nodeLabel}/${rf.ontologyField}: field diff")
          }
        }
      }
    }
  }

  test("registry groupings match mapping/__init__.py") {
    assume(Files.isRegularFile(registryFile))
    val src = new String(Files.readAllBytes(registryFile), "UTF-8")
    // var name -> file stem, from the import statements
    val imp = ("from cartography\\.models\\.ontology\\.mapping\\.data\\.(\\w+) import \\(?\\s*(\\w+)"
      .r).findAllMatchIn(src).map(m => m.group(2) -> m.group(1)).toMap
    def parseRegistry(name: String): Seq[(String, String)] = {
      val body = (s"$name[^=]*=\\s*\\{([^}]*)\\}").r.findFirstMatchIn(src)
        .getOrElse(sys.error(s"$name not found")).group(1)
      "\"(\\w+)\":\\s*(\\w+)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> imp(m.group(2))).toSeq
    }
    assert(MappingCorpus.nodeCategories.toSeq == parseRegistry("ONTOLOGY_NODES_MAPPING"))
    assert(MappingCorpus.semanticCategories.toSeq == parseRegistry("SEMANTIC_LABELS_MAPPING"))
  }

  test("corpus-wide strategy census: every special_handling is a known strategy") {
    val strategies = MappingCorpus.all.values.flatten
      .flatMap(_.nodes).flatMap(_.fields).flatMap(_.specialHandling).toSet
    assert(strategies.subsetOf(Set("static_value", "mapping", "equal_boolean",
      "coalesce", "invert_boolean", "to_boolean", "or_boolean", "nor_boolean")))
    // strategy extras carry what their interpreter case reads
    MappingCorpus.all.values.flatten.flatMap(_.nodes).flatMap(_.fields).foreach { f =>
      f.specialHandling match {
        case Some("static_value")  => assert(f.extraValue.isDefined, f)
        case Some("mapping")       => assert(f.extraMap.nonEmpty, f)
        case Some("equal_boolean") => assert(f.extraValues.nonEmpty, f)
        case Some("or_boolean") | Some("nor_boolean") | Some("coalesce") =>
          assert(f.extraFields.nonEmpty, f)
        case _ => ()
      }
    }
  }
}
