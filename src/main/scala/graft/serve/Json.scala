package graft.serve

/** Minimal JSON emitter for the serving layer's envelopes. The engine's
  * data plane never touches this — only the HTTP/SSE boundary, where the
  * payloads are small maps/rows (reference envelopes in
  * `api/AlertController.kt:83-138`, `cdp/api/CdpController.kt:183-220`).
  */
object Json {

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Render Scala values: String, Boolean, numbers, Timestamp (ISO-8601),
    * Option, Seq, Map[String, _], null. Insertion order of ListMap/linked
    * maps is preserved.
    */
  def write(v: Any): String = v match {
    case null => "null"
    case None => "null"
    case Some(x) => write(x)
    case s: String => "\"" + escape(s) + "\""
    case b: Boolean => b.toString
    case t: java.sql.Timestamp => "\"" + t.toInstant.toString + "\""
    case i: java.time.Instant => "\"" + i.toString + "\""
    case d: Double =>
      if (d.isNaN || d.isInfinite) "null" // bare NaN/Infinity is not JSON
      else if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case n: Number => n.toString
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => "\"" + escape(k.toString) + "\":" + write(x) }
        .mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(write).mkString("[", ",", "]")
    case other => "\"" + escape(other.toString) + "\""
  }

  def obj(fields: (String, Any)*): String =
    fields.map { case (k, v) => "\"" + escape(k) + "\":" + write(v) }
      .mkString("{", ",", "}")
}
