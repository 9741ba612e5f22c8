package graft.spec

import graft.SparkSpec
import graft.spec.AconConformance._

/** Conformance sweep over the ACONs embedded in the reference's PUBLIC
  * usage documentation (every `.md` code fence under
  * `lakehouse_engine_usage/`):
  * the docs are what reference users copy from, so every example that is
  * a complete config (not a parameterized template with Python variables
  * or callables) must PLAN against this engine — an unexplained rejection
  * means a user following the reference's own docs would hit a wall.
  *
  * Python dict literals normalize to JSON the obvious way (True/False/
  * None, trailing commas); blocks that still don't parse hold unresolved
  * Python identifiers (f-strings, `dbutils` calls, custom functions) and
  * classify as parameterized templates.
  */
class DocAconSweepSpec extends SparkSpec {

  private val root = new java.io.File("/root/reference/lakehouse_engine_usage")

  private def walk(f: java.io.File) = TestFiles.walk(f, ".md")

  /** Python-dict literal -> JSON text. */
  private def pyToJson(s: String): String =
    s.replaceAll("\\bTrue\\b", "true")
      .replaceAll("\\bFalse\\b", "false")
      .replaceAll("\\bNone\\b", "null")
      .replaceAll(",\\s*([}\\]])", "$1")

  /** Fence extraction by LINE-WISE opener/closer pairing: a regex that
    * only recognizes python/json openers mispairs after any other
    * language's fence (a ```sql block's CLOSER becomes the next opener),
    * silently dropping later acons from the sweep — so every fence pairs
    * here and the language filter happens afterward. */
  private def fencedBlocks(text: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var inside = false
    val buf = new StringBuilder
    text.linesIterator.foreach { line =>
      if (line.trim.startsWith("```")) {
        if (inside) { out += buf.toString; buf.clear() }
        inside = !inside
      } else if (inside) buf.append(line).append('\n')
    }
    out.result()
  }

  test("every complete acon in the reference's usage docs plans; templates classify") {
    assume(root.isDirectory, "reference usage docs not present")
    val blocks: Seq[(String, String)] = walk(root).flatMap { f =>
      val rel = f.getPath.stripPrefix(root.getPath + "/")
      val text = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      fencedBlocks(text)
        .filter(b => b.contains("input_specs") || b.contains("\"operations\""))
        .flatMap { b =>
          val start = b.indexOf('{'); val end = b.lastIndexOf('}')
          if (start >= 0 && end > start) Seq(rel -> b.substring(start, end + 1))
          else Seq.empty
        }
        .zipWithIndex.map { case ((r, b), i) => s"$r#$i" -> b }
    }
    assert(blocks.size > 40, s"expected the doc corpus, saw ${blocks.size}")

    var planned = 0
    var templates = 0
    val rejections = Seq.newBuilder[(String, String)]
    blocks.foreach { case (where, block) =>
      val json = pyToJson(block)
      val parsed =
        try Some(Specs.parseJsonMap(json))
        catch { case _: Exception => None }
      parsed match {
        case None => templates += 1 // unresolved Python identifiers
        case Some(_) =>
          try classify(spark, json) match {
            case Planned(_) => planned += 1
            case Fixture(_) => planned += 1
            case Rejected(kind, reason) =>
              rejections += (where -> s"[$kind] $reason")
          } catch {
            case e: Throwable =>
              rejections += (where -> s"[escape] ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    info(s"doc acons: ${blocks.size} blocks, $planned planned, " +
      s"$templates parameterized templates")
    val rej = rejections.result()
    assert(rej.isEmpty, "doc acons rejected:\n" +
      rej.map { case (w, r) => s"  $w: $r" }.mkString("\n"))
    assert(planned >= 20, s"expected at least 20 complete doc acons, planned $planned")
  }
}
