package graft.core

import java.nio.charset.StandardCharsets

/** Deterministic, total HTML -> text extraction. Re-imagines the reference's
  * asset->product processing step (GIPS `Data.process`, SURVEY.md §1.1) for
  * web pages: the "product" derived from the raw `html` binary is the page
  * text, and the gating invariant (BASELINE.json:input_hint) is that
  * extraction is byte-identical per url — same bytes in, same string out,
  * forever. Golden sha256 fixtures pin this (src/test/resources/golden).
  *
  * Algorithm (pure function, no regex backtracking, single pass):
  *  1. decode UTF-8;
  *  2. take the content between the first <body...> and </body> if both
  *     exist, else the whole document;
  *  3. drop <script>/<style> subtrees entirely;
  *  4. strip remaining tags and comments;
  *  5. decode the five XML entities + &apos; + &nbsp; + decimal &#NN;;
  *  6. collapse whitespace runs to a single space and trim.
  */
object Extract {

  def extractText(html: Array[Byte]): String =
    if (html == null) "" else extractText(new String(html, StandardCharsets.UTF_8))

  def extractText(doc: String): String = {
    if (doc == null) return ""
    val body = sliceBody(doc)
    val noTags = stripTags(body)
    collapseWs(noTags)
  }

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length
    val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      if (s.regionMatches(true, i, target, 0, m)) return i
      i += 1
    }
    -1
  }

  private def sliceBody(doc: String): String = {
    val open = indexOfIgnoreCase(doc, "<body", 0)
    if (open < 0) return doc
    val gt = doc.indexOf('>', open)
    if (gt < 0) return doc
    val close = indexOfIgnoreCase(doc, "</body", gt + 1)
    if (close < 0) doc.substring(gt + 1) else doc.substring(gt + 1, close)
  }

  /** Every dropped tag / comment / script block is replaced by one space
    * (a whitespace separator), which `collapseWs` then normalizes — so
    * block boundaries never glue words together, and `<p>x</p>` still
    * round-trips to exactly `x`. */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        sb.append(' ')
        if (s.regionMatches(true, i, "<script", 0, 7)) {
          val end = indexOfIgnoreCase(s, "</script", i + 7)
          i = if (end < 0) n else skipToGt(s, end)
        } else if (s.regionMatches(true, i, "<style", 0, 6)) {
          val end = indexOfIgnoreCase(s, "</style", i + 6)
          i = if (end < 0) n else skipToGt(s, end)
        } else if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val gt = s.indexOf('>', i)
          i = if (gt < 0) n else gt + 1
        }
      } else if (c == '&') {
        val (repl, next) = decodeEntity(s, i)
        sb.append(repl)
        i = next
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }

  private def skipToGt(s: String, from: Int): Int = {
    val gt = s.indexOf('>', from)
    if (gt < 0) s.length else gt + 1
  }

  /** Returns (replacement, next index). Unknown entities pass through as-is. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 8) return ("&", i + 1)
    s.substring(i + 1, semi) match {
      case "amp"  => ("&", semi + 1)
      case "lt"   => ("<", semi + 1)
      case "gt"   => (">", semi + 1)
      case "quot" => ("\"", semi + 1)
      case "apos" => ("'", semi + 1)
      case "#39"  => ("'", semi + 1)
      case "nbsp" => (" ", semi + 1)
      case e if e.length > 1 && e.charAt(0) == '#' && e.drop(1).forall(_.isDigit) =>
        val code = e.drop(1).toInt
        if (code >= 0 && code <= 0x10FFFF) (new String(Character.toChars(code)), semi + 1)
        else ("&", i + 1)
      case _ => ("&", i + 1)
    }
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B) {
        pendingSpace = sb.length() > 0
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Escape text for embedding into generated HTML so that
    * extractText(htmlOf(text)) == text byte-for-byte. */
  def escapeHtml(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      text.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** The page generator's HTML shape (FIXTURES.md §2). */
  def htmlOf(docId: Long, text: String): String =
    s"<html><head><title>d$docId</title></head><body><p>${escapeHtml(text)}</p></body></html>"
}
