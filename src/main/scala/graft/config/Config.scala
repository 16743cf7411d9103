package graft.config

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** YAML-backed pipeline configuration (reference: ons_utils/config/config.py).
  *
  * Attribute semantics ported: `update`, `setAttrs` with `toUnpack`
  * (config.py:110-136, ConfigFormatError on non-mapping), attr transforms
  * (flatten, key-value pairs, tuple fills), `extendAttr`, `removeFromAttr`,
  * `prependDir`. Directory resolution order: `$GRAFT_CONFIG` env var, then
  * `~/cprices/cprices`, `~/cprices`, `~`, cwd — first location containing a
  * `config/` folder (config.py:60-85; env var renamed for this library).
  *
  * YAML: no YAML jar ships with Spark's jars dir, so a minimal indentation
  * parser covers the subset the reference exercises (nested maps, lists of
  * scalars, string/int/double/bool/null scalars, comments).
  */
class ConfigFormatError(msg: String) extends RuntimeException(msg)

class Config private (val name: String) {
  private val attrs = mutable.LinkedHashMap.empty[String, Any]

  def get(key: String): Any = attrs.getOrElse(key,
    throw new NoSuchElementException(s"config attribute not set: $key"))
  def getMap(key: String): Map[String, Any] = get(key).asInstanceOf[Map[String, Any]]
  def getSeq(key: String): Seq[Any] = get(key).asInstanceOf[Seq[Any]]
  def has(key: String): Boolean = attrs.contains(key)
  def attributes: Map[String, Any] = attrs.toMap

  def update(m: Map[String, Any]): Unit = attrs ++= m

  /** Set attributes; keys in `toUnpack` must hold mappings whose entries
    * are ALSO promoted to top-level attributes (reference config.py:110-136).
    */
  def setAttrs(m: Any, toUnpack: Seq[String] = Nil): Unit = {
    val mapping = m match {
      case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
      case other => throw new ConfigFormatError(
        s"config root must be a mapping, got: ${if (other == null) "null" else other.getClass.getSimpleName}")
    }
    toUnpack.foreach { key =>
      mapping.getOrElse(key, throw new NoSuchElementException(s"to_unpack key absent: $key")) match {
        case nested: Map[_, _] => update(nested.asInstanceOf[Map[String, Any]])
        case _ => throw new IllegalArgumentException(s"given attr $key to unpack must be a mapping")
      }
    }
    update(mapping)
  }

  /** Flatten nested-map attributes to Seq[String]-keyed maps. */
  def flattenNestedDicts(keys: Seq[String]): Unit =
    keys.foreach { k =>
      attrs(k) = graft.ops.Reshape.flattenNested(getMap(k)).toMap
    }

  /** Replace seq-valued map attrs with exploded (key, value) pairs. */
  def getKeyValuePairs(keys: Seq[String]): Unit =
    keys.foreach { k =>
      attrs(k) = graft.ops.Reshape.keyValuePairs(
        getMap(k).toSeq.map { case (a, b) => (a, b) })
    }

  /** Pad Seq[Seq[String]]-valued attrs to uniform tuple length. */
  def fillTuples(keys: Seq[String], method: String = "ffill"): Unit =
    keys.foreach { k =>
      attrs(k) = graft.ops.Reshape.fillTuples(
        getSeq(k).map(_.asInstanceOf[Seq[String]]), method)
    }

  /** Pad the tuple KEYS of Map[Seq[String], _]-valued attrs to uniform
    * length (reference config.py:155-168 `fill_tuple_keys`).
    */
  def fillTupleKeys(keys: Seq[String], method: String = "ffill"): Unit =
    keys.foreach { k =>
      val m = get(k).asInstanceOf[Map[Seq[String], Any]]
      val ordered = m.toSeq
      val padded = graft.ops.Reshape.fillTuples(ordered.map(_._1), method)
      attrs(k) = padded.zip(ordered.map(_._2)).toMap
    }

  def extendAttr(key: String, values: Seq[Any]): Unit = get(key) match {
    case s: Seq[_] => attrs(key) = s ++ values
    case _ => throw new IllegalArgumentException(s"attribute $key is not an extendable type")
  }

  def removeFromAttr(key: String, remove: Set[Any]): Unit = get(key) match {
    case s: Seq[_] => attrs(key) = s.filterNot(remove.contains)
    case _ => throw new IllegalArgumentException(
      s"attribute $key is not a collection. There are no removable items")
  }

  /** Prepend a directory to path-valued attrs (scalar or map-of-paths). */
  def prependDir(keys: Seq[String], dir: String): Unit =
    keys.foreach { k =>
      get(k) match {
        case m: Map[_, _] =>
          attrs(k) = m.asInstanceOf[Map[String, Any]].map {
            case (key, p) => key -> Paths.get(dir, p.toString).toString
          }
        case p => attrs(k) = Paths.get(dir, p.toString).toString
      }
    }
}

object Config {

  /** Resolution order for the config directory (reference config.py:60-85). */
  def configDir(): Option[Path] = {
    sys.env.get("GRAFT_CONFIG").map(Paths.get(_)).orElse {
      val home = Paths.get(sys.props("user.home"))
      Seq(
        home.resolve("cprices").resolve("cprices"),
        home.resolve("cprices"),
        home,
        Paths.get(".").toAbsolutePath.normalize,
      ).find(loc => Files.exists(loc.resolve("config"))).map(_.resolve("config"))
    }
  }

  /** Load `<dir>/[subdir/]<filename>.yaml`. */
  def load(filename: String, subdir: Option[String] = None,
           toUnpack: Seq[String] = Nil, dirOverride: Option[Path] = None): Config = {
    val dir = dirOverride.orElse(configDir()).getOrElse(
      throw new ConfigFormatError("no config directory found"))
    val path = subdir.fold(dir)(dir.resolve).resolve(filename + ".yaml")
    val cfg = new Config(filename)
    cfg.setAttrs(Yaml.parse(Files.readString(path)), toUnpack)
    cfg
  }

  def fromString(name: String, yaml: String, toUnpack: Seq[String] = Nil): Config = {
    val cfg = new Config(name)
    cfg.setAttrs(Yaml.parse(yaml), toUnpack)
    cfg
  }
}

/** Minimal YAML subset parser: nested maps by 2-space indentation, `- `
  * lists of scalars, inline scalars (string/int/double/bool/null), `#`
  * comments, quoted strings.
  */
object Yaml {

  def parse(text: String): Any = {
    val lines = text.linesIterator
      .map(stripComment)
      .filter(_.trim.nonEmpty)
      .toVector
    if (lines.isEmpty) Map.empty[String, Any]
    else {
      val (value, consumed) = parseBlock(lines, 0)
      if (consumed != lines.length)
        throw new ConfigFormatError(
          s"unparsed yaml starting at: '${lines(consumed).trim}' " +
            "(mis-indented line or unsupported construct)")
      value
    }
  }

  private def stripComment(line: String): String = {
    var inS = false; var inD = false
    val sb = new StringBuilder
    for (c <- line) {
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD) return sb.toString
      sb.append(c)
    }
    sb.toString
  }

  private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

  /** Parse the block starting at `start`; returns (value, nextIndex). */
  private def parseBlock(lines: Vector[String], start: Int): (Any, Int) = {
    val indent = indentOf(lines(start))
    if (lines(start).trim.startsWith("- ")) {
      val items = mutable.ListBuffer.empty[Any]
      var i = start
      while (i < lines.length && indentOf(lines(i)) == indent &&
             lines(i).trim.startsWith("- ")) {
        items += scalar(lines(i).trim.drop(2).trim)
        i += 1
      }
      (items.toList, i)
    } else {
      val m = mutable.LinkedHashMap.empty[String, Any]
      var i = start
      while (i < lines.length && indentOf(lines(i)) == indent) {
        val line = lines(i).trim
        val colon = line.indexOf(':')
        require(colon > 0, s"malformed yaml line: $line")
        val key = unquote(line.take(colon).trim)
        val rest = line.drop(colon + 1).trim
        if (rest.nonEmpty) {
          m(key) = scalar(rest); i += 1
        } else if (i + 1 < lines.length && indentOf(lines(i + 1)) > indent) {
          val (v, next) = parseBlock(lines, i + 1)
          m(key) = v; i = next
        } else {
          m(key) = null; i += 1
        }
      }
      (m.toMap, i)
    }
  }

  private def unquote(s: String): String =
    if ((s.startsWith("\"") && s.endsWith("\"")) ||
        (s.startsWith("'") && s.endsWith("'"))) s.substring(1, s.length - 1)
    else s

  private[config] def scalar(s: String): Any = {
    val t = s.trim
    if (t.startsWith("[") && t.endsWith("]")) {
      val inner = t.substring(1, t.length - 1).trim
      if (inner.isEmpty) List.empty[Any]
      else inner.split(",").toList.map(x => scalar(x.trim))
    }
    else if (t == "null" || t == "~") null
    else if (t == "true") true
    else if (t == "false") false
    else if (t.matches("-?\\d+")) t.toLong match {
      case l if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
      case l => l
    }
    else if (t.matches("-?\\d*\\.\\d+([eE][-+]?\\d+)?")) t.toDouble
    else unquote(t)
  }
}
