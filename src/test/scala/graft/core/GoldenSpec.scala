package graft.core

import scala.io.Source

import graft.testutil.SparkTestBase
import graft.tools.GoldenGen

/** Byte-identical regression gates against the committed goldens: the
  * extractor and the polygon-cover geometry may only change behavior via a
  * deliberate golden regeneration (BASELINE.json per-row invariant). */
class GoldenSpec extends SparkTestBase {

  private def resource(path: String): Seq[String] = {
    val in = getClass.getResourceAsStream(path)
    assert(in != null, s"missing golden resource $path — run Test/runMain graft.tools.GoldenGen")
    try Source.fromInputStream(in, "UTF-8").getLines().toList finally in.close()
  }

  test("extract_text sha256 golden: byte-identical per url") {
    val want = resource("/golden/text_sha256.csv").drop(1)
    val got = GoldenGen.textGoldenLines(spark)
    assert(got.size === want.size)
    for ((g, w) <- got.zip(want)) assert(g === w)
  }

  test("tile coverage golden: cover cells + fractions stable") {
    val want = resource("/footprints/expected_cover.csv").drop(1)
    val got = GoldenGen.coverGoldenLines()
    assert(got.size === want.size)
    for ((g, w) <- got.zip(want)) assert(g === w)
  }
}
