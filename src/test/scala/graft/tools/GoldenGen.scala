package graft.tools

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

import graft.core.{Extract, Geo}
import graft.sources.Footprints

/** One-shot generator for the committed golden fixtures (FIXTURES.md §2/§5).
  * Run via `sbt "Test/runMain graft.tools.GoldenGen"`; outputs land in
  * src/test/resources and are committed. Tests then assert byte-identical
  * behavior against these files forever — regenerating them is a deliberate
  * act, never automatic.
  */
object GoldenGen {

  def sha256(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def textGoldenLines(spark: SparkSession): Seq[String] = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    docs.map { case (id, text, source) =>
      val url = s"https://$source.example.com/doc/$id"
      val extracted = Extract.extractText(Extract.htmlOf(id, text).getBytes("UTF-8"))
      s"$url,${sha256(extracted)}"
    }.toSeq
  }

  def coverGoldenLines(): Seq[String] = {
    val boxes = Footprints.boxes.flatMap { b =>
      Geo.coverWithFrac(b.wkt, 4).map { case (cell, frac) =>
        f"${b.fpId},4,$cell,$frac%.9f"
      }
    }
    val polys = Footprints.polys.flatMap { case (id, wkt) =>
      Geo.coverWithFrac(wkt, 6).map { case (cell, frac) => f"$id,6,$cell,$frac%.9f" }
    }
    boxes ++ polys
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val res = Paths.get("src/test/resources")
    Files.createDirectories(res.resolve("golden"))
    Files.createDirectories(res.resolve("footprints"))
    Files.writeString(res.resolve("golden/text_sha256.csv"),
      ("url,sha256" +: textGoldenLines(spark)).mkString("\n") + "\n")
    Files.writeString(res.resolve("footprints/expected_cover.csv"),
      ("fp_id,level,cell_id,coverage_frac" +: coverGoldenLines()).mkString("\n") + "\n")
    println(s"goldens written under $res")
    spark.stop()
  }
}
