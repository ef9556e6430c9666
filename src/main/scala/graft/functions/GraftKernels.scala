package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels called from generated code (static-call shape keeps the
  * enclosing whole-stage-codegen span alive — see ShingleHashesExpr). */
object GraftKernels {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val Empty = new GenericArrayData(Array.emptyLongArray)

  /** Greedy BPE merge replay: split `word` into single-char symbols, then
    * apply each merge (l, r) in ORDER with one left-to-right
    * non-overlapping scan — the exact trainer semantics. The single
    * source of truth for segmentation: the q113 trainer's replay, the
    * q123 encode expression and the specs all call this. */
  def bpeSegment(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    for ((l, r) <- merges) {
      val merged = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          merged += (l + r); i += 2
        } else { merged += syms(i); i += 1 }
      }
      syms = merged.result()
    }
    syms
  }

  /** Codegen entry point for BpeSubtokensExpr: subtoken count of `word`
    * under a PRE-PARSED merge list (held as a codegen reference object —
    * parsed once per expression instance, not per row). */
  def bpeSubtokenCount(word: UTF8String, merges: Seq[(String, String)]): Int =
    bpeSegment(word.toString, merges).length

  /** 60-bit md5-prefix hash of every 3-gram shingle of the space-split
    * tokens of `text`. Tokenization matches Spark `split(text, " ")`
    * (trailing empties kept), shingle text matches
    * `concat_ws(" ", slice(toks, j+1, 3))`, and the value matches
    * `conv(substring(md5(s), 1, 15), 16, 10)`: the first 15 hex chars are
    * digest bytes 0..6 plus the high nibble of byte 7. */
  /** Codegen entry point for ArgminL2Expr: 0-based index of the centroid
    * minimizing squared L2 against `x`; strict `<` keeps the FIRST index
    * on ties — with a cid-ascending matrix that is exactly the (cd, cid)
    * argmin tiebreak of the ANN family. One static call per row keeps
    * the whole-stage span alive (the interpreted `transform` lambda this
    * replaces broke codegen on the corpus-assignment hot path). */
  def argminL2(x: ArrayData, cents: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var ci = 0
    while (ci < cents.length) {
      val cv = cents(ci)
      val n = math.min(x.numElements(), cv.length)
      var s = 0L
      var i = 0
      while (i < n) { val d = x.getLong(i) - cv(i); s += d * d; i += 1 }
      if (s < bestD) { bestD = s; best = ci }
      ci += 1
    }
    best
  }

  def shingleHashes(text: UTF8String): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < 3) return Empty
    val out = new Array[Long](toks.length - 2)
    val d = md5.get()
    var j = 0
    while (j < out.length) {
      d.reset()
      d.update(toks(j).getBytes(UTF_8))
      d.update(' '.toByte)
      d.update(toks(j + 1).getBytes(UTF_8))
      d.update(' '.toByte)
      d.update(toks(j + 2).getBytes(UTF_8))
      val dg = d.digest()
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (dg(i) & 0xffL); i += 1 }
      out(j) = (v << 4) | ((dg(7) >> 4) & 0xfL)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Codegen twin of CellCoverExpr's eval: quadtree cover of a WKT
    * geometry, or Java null on a MALFORMED geometry (the degrade-don't-
    * abort rule — one corrupt footprint in 10^12 rows must not kill the
    * job). The exception classification lives here, once, so the
    * generated code is a single static call the JIT can inline; caller
    * bugs (bad level) stay fatal exactly like the interpreted path. */
  def coverOrNull(wkt: UTF8String, level: Int): ArrayData =
    try new GenericArrayData(graft.core.Geo.cover(wkt.toString, level))
    catch {
      case _: org.locationtech.jts.io.ParseException => null
      case _: org.locationtech.jts.geom.TopologyException => null
      case e: RuntimeException
          if e.getCause.isInstanceOf[org.locationtech.jts.io.ParseException] => null
    }
}
