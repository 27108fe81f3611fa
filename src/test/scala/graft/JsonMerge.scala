package graft

/** Minimal top-level-key upsert for the flat JSON records the harness
  * mains write (scale_exp_refit.json, etl_bench.json): [[IsoProbe]]
  * merges its `isolated` block into the refit record ScaleExp wrote
  * without disturbing the per-row entries. Only as general as our own
  * writers need — top-level object, string values carry no unescaped
  * braces/brackets (ours are query names and numbers) — and pinned by
  * JsonMergeSpec.
  */
object JsonMerge {

  /** Replace-or-insert `"key": value` at the top level of `json`. */
  def setTopLevelKey(json: String, key: String, value: String): String = {
    val trimmed = json.trim
    require(trimmed.startsWith("{") && trimmed.endsWith("}"),
      "setTopLevelKey expects a JSON object")
    val body = trimmed.substring(1, trimmed.length - 1)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    var start = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1 // skip the escaped char
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case ',' if depth == 0 =>
          entries += body.substring(start, i)
          start = i + 1
        case _ =>
      }
      i += 1
    }
    if (body.substring(start).trim.nonEmpty) entries += body.substring(start)
    val kept = entries.filterNot(_.trim.startsWith("\"" + key + "\""))
    (kept.toSeq :+ s""""$key":$value""").mkString("{", ",", "}")
  }
}
