package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.matching.Regex

/** The reference's config algebra (SURVEY.md §2.A S8, A5, F4, P6-P8):
  * a single JSON document (`cnf/osci-conf.json`,
  * `/root/reference/bin/constants.sh:7`) holding named sub-configs that
  * commands select by name (`bin/mskc-connector.sh:512`), append
  * (`:570`), delete (`:94`), and reload-and-revalidate after save
  * (`:571-574`).
  *
  * Driver-side metadata, so this is plain Scala over a minimal JSON
  * model — no Spark job for a kilobyte of config. The same operators
  * exist data-plane-side as queries (fn_json, json_select_by_key,
  * join_left_anti).
  */
object ConfigStore {

  // ---- minimal JSON model (no external deps available offline) -------
  sealed trait JValue
  final case class JString(v: String) extends JValue
  final case class JNum(v: Double) extends JValue
  final case class JBool(v: Boolean) extends JValue
  case object JNull extends JValue
  final case class JArr(items: Vector[JValue]) extends JValue
  final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
    def get(key: String): Option[JValue] =
      fields.collectFirst { case (k, v) if k == key => v }
    def updated(key: String, value: JValue): JObj =
      if (fields.exists(_._1 == key))
        JObj(fields.map { case (k, v) =>
          if (k == key) (k, value) else (k, v) })
      else JObj(fields :+ (key -> value))
  }

  // ---- parser --------------------------------------------------------
  def parse(s: String): JValue = new Parser(s).parseValue()

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit =
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      ws()
      require(i < s.length && s.charAt(i) == c,
        s"expected '$c' at $i in: ${s.slice(i, i + 20)}")
      i += 1
    }
    def parseValue(): JValue = {
      ws()
      s.charAt(i) match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JString(parseString())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _ => parseNum()
      }
    }
    private def parseObj(): JObj = {
      expect('{'); ws()
      if (s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
      val buf = Vector.newBuilder[(String, JValue)]
      var done = false
      while (!done) {
        ws()
        val k = parseString()
        expect(':')
        buf += (k -> parseValue())
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect('}'); done = true }
      }
      JObj(buf.result())
    }
    private def parseArr(): JArr = {
      expect('['); ws()
      if (s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
      val buf = Vector.newBuilder[JValue]
      var done = false
      while (!done) {
        buf += parseValue()
        ws()
        if (s.charAt(i) == ',') i += 1 else { expect(']'); done = true }
      }
      JArr(buf.result())
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case c => sb.append(c)
          }
        } else sb.append(s.charAt(i))
        i += 1
      }
      i += 1
      sb.toString
    }
    private def parseNum(): JNum = {
      val start = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      JNum(s.substring(start, i).toDouble)
    }
  }

  // ---- render --------------------------------------------------------
  def render(v: JValue): String = v match {
    case JString(x) => "\"" + x.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\t' => "\\t"; case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    case JNum(x) =>
      if (x == x.floor && !x.isInfinite && math.abs(x) < 1e15)
        x.toLong.toString
      else x.toString
    case JBool(x) => x.toString
    case JNull => "null"
    case JArr(xs) => xs.map(render).mkString("[", ",", "]")
    case JObj(fs) =>
      fs.map { case (k, x) => render(JString(k)) + ":" + render(x) }
        .mkString("{", ",", "}")
  }

  // ---- the jq algebra the reference exercises ------------------------

  /** `.Section[] | select(.<nameKey> == name)` — F4 select-by-name. */
  def selectByName(doc: JObj, section: String, nameKey: String,
                   name: String): Option[JObj] =
    doc.get(section) match {
      case Some(JArr(items)) => items.collectFirst {
        case o: JObj if o.get(nameKey).contains(JString(name)) => o
      }
      case _ => None
    }

  /** `.Section += [entry]` — A5 append (`bin/mskc-connector.sh:570`). */
  def appendEntry(doc: JObj, section: String, entry: JObj): JObj = {
    val arr = doc.get(section) match {
      case Some(JArr(items)) => JArr(items :+ entry)
      case _ => JArr(Vector(entry))
    }
    doc.updated(section, arr)
  }

  /** `del(.Section[] | select(.<nameKey> == name))` — A5 delete
    * (`bin/mskc-connector.sh:94`). */
  def deleteByName(doc: JObj, section: String, nameKey: String,
                   name: String): JObj =
    doc.get(section) match {
      case Some(JArr(items)) =>
        doc.updated(section, JArr(items.filterNot {
          case o: JObj => o.get(nameKey).contains(JString(name))
          case _ => false
        }))
      case _ => doc
    }

  // ---- persistence with reload-after-save discipline -----------------

  def load(path: String): JObj = parse(
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
    .asInstanceOf[JObj]

  /** Save then reload and return the reloaded document — the reference's
    * save-reload-revalidate discipline (`bin/mskc-connector.sh:571-574`).
    */
  def save(path: String, doc: JObj): JObj = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      render(doc).getBytes(StandardCharsets.UTF_8))
    load(path)
  }

  // ---- P8: config-provider placeholder interpolation -----------------

  /** `${provider:path:key}` placeholders, as resolved by the deployed
    * worker's config providers (`/root/reference/bin/mskc-worker.sh:61-63`;
    * usage `bin/mskc-connector.sh:401,:405`). `resolve` maps
    * (provider, path, key) → secret value.
    */
  private val Placeholder: Regex = """\$\{([^:}]+):([^:}]+):([^}]+)\}""".r

  def interpolate(value: String,
                  resolve: (String, String, String) => Option[String])
      : Either[String, String] = {
    var missing = List.empty[String]
    val out = Placeholder.replaceAllIn(value, m => {
      resolve(m.group(1), m.group(2), m.group(3)) match {
        case Some(v) => Regex.quoteReplacement(v)
        case None => missing ::= m.matched; Regex.quoteReplacement(m.matched)
      }
    })
    if (missing.isEmpty) Right(out)
    else Left(s"unresolved placeholders: ${missing.reverse.mkString(", ")}")
  }
}
