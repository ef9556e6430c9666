package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testutil.Checks
import java.nio.charset.StandardCharsets

class ExtractSpec extends AnyFunSuite with Checks {
  import Extract._

  private val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokenText = Gen.listOf(token).map(_.mkString(" "))

  test("round-trip: extractText(htmlOf(text)) == text byte-for-byte") {
    forAll(Gen.choose(0L, 1000000L), tokenText) { (id, text) =>
      val got = extractText(htmlOf(id, text).getBytes(StandardCharsets.UTF_8))
      assert(got === text.split("\\s+").filter(_.nonEmpty).mkString(" "))
    }
  }

  test("round-trip with special characters via escapeHtml") {
    val texts = Seq("a & b", "x < y > z", "quote \" apos '", "mixed &amp; raw")
    for (t <- texts) {
      val got = extractText(htmlOf(7, t))
      assert(got === t, s"for [$t]")
    }
  }

  test("title is excluded (body-only extraction)") {
    assert(extractText("<html><head><title>SECRET</title></head><body><p>hello</p></body></html>") === "hello")
  }

  test("script and style subtrees dropped") {
    val h = "<body><p>a</p><script>var x = '<b>no</b>';</script><style>p{color:red}</style><p>b</p></body>"
    assert(extractText(h) === "a b")
  }

  test("comments dropped") {
    assert(extractText("<body>a<!-- hidden <b>x</b> -->b</body>") === "a b")
  }

  test("entity decoding") {
    assert(extractText("<body>&lt;tag&gt; &amp; &quot;q&quot; &apos;a&apos; &#39;b&#39; &#65;</body>")
      === "<tag> & \"q\" 'a' 'b' A")
    // unknown entity passes through
    assert(extractText("<body>&unknown; x</body>") === "&unknown; x")
  }

  test("whitespace collapsed, trimmed") {
    assert(extractText("<body>  a\n\t b \r\n c  </body>") === "a b c")
  }

  test("no body tag: whole document") {
    assert(extractText("<p>just text</p>") === "just text")
  }

  test("multibyte UTF-8 survives") {
    val t = "héllo wörld 中文 😀"
    assert(extractText(htmlOf(1, t).getBytes(StandardCharsets.UTF_8)) === t)
  }

  test("null / empty total") {
    assert(extractText(null: Array[Byte]) === "")
    assert(extractText(Array.emptyByteArray) === "")
    assert(extractText("") === "")
  }

  test("unclosed tags / malformed html do not throw") {
    val cases = Seq("<body><p>a", "<body x=", "<script>never closed", "a<b", "&", "&#;", "&#999999999;")
    for (c <- cases) extractText(c) // must not throw
  }

  test("determinism: same bytes -> same string, 1000 ids") {
    (0L until 1000L).foreach { id =>
      val text = s"tok${id % 7} tok${id % 13} data page"
      val a = extractText(htmlOf(id, text))
      val b = extractText(htmlOf(id, text))
      assert(a === b && a === text)
    }
  }
}
