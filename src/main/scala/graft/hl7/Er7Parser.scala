package graft.hl7

/** One parsed ER7 segment in the canonical generic form (SURVEY.md §1.3).
  *
  * `fields` is a flat map from element address to its repetition values:
  *   - "PID-5"     → whole field, one entry per repetition (`~`)
  *   - "PID-5-1"   → component (`^`), emitted when the field has >1 component
  *   - "PID-3-4-2" → subcomponent (`&`), emitted when a component has >1
  * The whole-field entry always exists, so `fields("PID-8")(0)` works for
  * simple fields and typed views can still reach into components.
  */
case class Er7Segment(segment_id: String, seq: Int, fields: Map[String, Seq[String]])

/** Parse result. `error == null` ⇔ success (null, not Option, so the Spark
  * encoder maps it to a nullable string column filterable with isNull). */
case class Er7Parsed(
    version: String,
    message_type: String,
    segments: Seq[Er7Segment],
    error: String)

/** Syntax-driven HL7 v2.x ER7 parser.
  *
  * Re-expresses the behavior of the reference's grammar-driven parse step
  * (`/root/reference/microservices/staging_er7/parse_er7_lambda.py:8-69`)
  * without the per-version XSD grammars: separators are read from MSH-1/MSH-2
  * per message (handles the nonstandard backtick escape char of
  * `/root/reference/messages/lab01.txt:1`), and structure comes from the
  * encoding itself (field `|`, repetition `~`, component `^`, subcomponent
  * `&`). The reference's "unknown element ⇒ error" strictness
  * (`parse_er7_lambda.py:36-38`) becomes: structurally invalid message ⇒
  * `Left(reason)`, routed to the error zone by the pipeline (A13).
  *
  * Pure function `String ⇒ Either[String, Er7Parsed]` — no Spark imports, so
  * it unit-tests without a session and is trivially wrapped as a UDF.
  */
object Er7Parser {

  private val knownVersions = Set(
    "2.1", "2.2", "2.3", "2.3.1", "2.4", "2.5", "2.5.1",
    "2.6", "2.7", "2.7.1", "2.8", "2.8.1", "2.8.2", "2.9")

  def parse(raw: String): Either[String, Er7Parsed] = {
    if (raw == null || raw.length < 8) return Left("message too short")
    if (!raw.startsWith("MSH")) return Left("message does not start with MSH")
    val fieldSep = raw.charAt(3)
    val msh2 = raw.substring(4).takeWhile(_ != fieldSep)
    if (msh2.isEmpty || msh2.length > 4) return Left(s"invalid MSH-2 encoding characters '$msh2'")
    val compSep = msh2.charAt(0)
    val repSep = if (msh2.length > 1) msh2.charAt(1) else '~'
    val escChar = if (msh2.length > 2) msh2.charAt(2) else '\\'
    val subSep = if (msh2.length > 3) msh2.charAt(3) else '&'

    val segLines = raw.split('\r').toSeq.map(_.trim).filter(_.nonEmpty)
    val mshTokens = splitKeepAll(segLines.head, fieldSep)
    // MSH numbering: MSH-1 is the separator itself, MSH-2 the encoding chars,
    // so token i (0-based, token 0 = "MSH") addresses field i+1 from MSH-2 on.
    val version = if (mshTokens.length > 11) unescape(mshTokens(11), escChar) else ""
    if (version.isEmpty) return Left("missing MSH-12 version")
    if (!knownVersions.contains(version)) return Left(s"unsupported HL7 version '$version'")
    val messageType =
      if (mshTokens.length > 8) unescape(mshTokens(8).replace(compSep, '^'), escChar) else ""

    val segments = segLines.zipWithIndex.map { case (line, idx) =>
      val tokens = splitKeepAll(line, fieldSep)
      val segId = tokens.head
      if (segId.length < 2 || segId.length > 3 || !segId.forall(c => c.isLetterOrDigit))
        return Left(s"invalid segment id '$segId' at segment ${idx + 1}")
      val fields = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
      def put(key: String, value: String): Unit =
        fields.update(key, fields.getOrElse(key, Vector.empty) :+ value)

      val isMsh = segId == "MSH"
      val body = if (isMsh) {
        put(s"$segId-1", fieldSep.toString)
        put(s"$segId-2", msh2)
        // MSH-2 must not be component/repetition split; fields resume at MSH-3
        tokens.drop(2).zipWithIndex.map { case (t, i) => (t, i + 3) }
      } else {
        tokens.drop(1).zipWithIndex.map { case (t, i) => (t, i + 1) }
      }

      body.foreach { case (fieldRaw, fNum) =>
        if (fieldRaw.nonEmpty) {
          val reps = splitKeepAll(fieldRaw, repSep)
          reps.foreach { rep =>
            put(s"$segId-$fNum", unescape(rep, escChar))
            val comps = splitKeepAll(rep, compSep)
            if (comps.length > 1) comps.zipWithIndex.foreach { case (comp, ci) =>
              if (comp.nonEmpty) {
                put(s"$segId-$fNum-${ci + 1}", unescape(comp, escChar))
                val subs = splitKeepAll(comp, subSep)
                if (subs.length > 1) subs.zipWithIndex.foreach { case (sub, si) =>
                  if (sub.nonEmpty)
                    put(s"$segId-$fNum-${ci + 1}-${si + 1}", unescape(sub, escChar))
                }
              }
            }
          }
        }
      }
      Er7Segment(segId, idx + 1, fields.toMap)
    }
    Right(Er7Parsed(version, messageType, segments, null))
  }

  /** split that keeps trailing empty tokens (ER7 position = meaning). */
  private def splitKeepAll(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  /** HL7 escape-sequence decoding with the message's own escape char.
    * Recognized: \F\ \S\ \T\ \R\ \E\ (separator literals), \Xdd..\ (hex
    * bytes), \.br\ (line break). Unrecognized sequences — e.g. the RTF blobs
    * in `/root/reference/messages/lab01.txt:16` that are full of raw
    * backslashes — are left untouched (lenient mode; the strict reference
    * would have hl7apy keep them verbatim too since they sit in FT fields). */
  def unescape(s: String, esc: Char): String = {
    if (s.indexOf(esc) < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == esc) {
        val end = s.indexOf(esc, i + 1)
        if (end < 0) { sb.append(c); i += 1 } // trailing escape, keep verbatim
        else {
          val body = s.substring(i + 1, end)
          body match {
            case "F" => sb.append('|'); i = end + 1
            case "S" => sb.append('^'); i = end + 1
            case "T" => sb.append('&'); i = end + 1
            case "R" => sb.append('~'); i = end + 1
            case "E" => sb.append(esc); i = end + 1
            case ".br" => sb.append('\r'); i = end + 1
            case b if b.length >= 2 && b.charAt(0) == 'X' &&
                b.drop(1).forall(ch => Character.digit(ch, 16) >= 0) =>
              b.drop(1).grouped(2).foreach(h => sb.append(Integer.parseInt(h, 16).toChar))
              i = end + 1
            case _ => sb.append(c); i += 1 // unrecognized: keep and move on
          }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
