package graft.core

/** Scalar naming/formatting utilities from the reference's output layer
  * (SURVEY §2.7 scalar functions). Pure driver-side string functions —
  * they name tables/layers, they never touch row data. */
object Names {

  /** ValidateName (gSSURGO_CreateSoilMap.py:3518-3557) + the
    * underscore-squeeze (:10590-10607): sanitize a user-facing
    * attribute name into a physical table/column identifier. Like the
    * reference, invalid characters are DROPPED (not substituted) and
    * only ASCII [A-Za-z0-9_.] survive; spaces become single
    * underscores; a leading digit is guarded; truncation cannot leave
    * a trailing underscore. */
  def validateName(raw: String, maxLen: Int = 60): String = {
    val spaced = raw.trim.replaceAll("\\s+", "_")
    val cleaned = spaced.filter(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '.')
    val squeezed = "_+".r.replaceAllIn(cleaned, "_")
      .stripPrefix("_").stripSuffix("_")
    val headOk = if (squeezed.nonEmpty && squeezed.head.isDigit) "z" + squeezed else squeezed
    headOk.take(maxLen).stripSuffix("_")
  }

  /** SQL IN-list rendering (tuple-building,
    * gSSURGO_CreateSoilMap.py:10250): quotes and joins values. An empty
    * selection is a caller bug (`IN ()` parses nowhere). */
  def inList(values: Seq[String]): String = {
    require(values.nonEmpty, "IN-list requires at least one value")
    values.map(v => "'" + v.replace("'", "''") + "'").mkString("(", ", ", ")")
  }

  /** CreateJSONLegend semantic core (gSSURGO_CreateSoilMap.py:1495-2028):
    * ordered (class label, lower, upper) breaks → the JSON legend blob
    * stored in SDV_Symbology (capped at 20,480 chars, :9622-9631). */
  def legendJson(title: String, classes: Seq[(String, Double, Double)],
      cap: Int = 20480): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def num(d: Double): String =
      if (d.isNaN || d.isInfinite) "null" else d.toString
    val body = classes.map { case (label, lo, hi) =>
      s"""{"label":"${esc(label)}","min":${num(lo)},"max":${num(hi)}}"""
    }.mkString("[", ",", "]")
    val json = s"""{"title":"${esc(title)}","classes":$body}"""
    require(json.length <= cap, s"legend blob exceeds $cap chars")
    json
  }
}
