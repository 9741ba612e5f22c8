package graft.spec

import graft.SparkSpec
import graft.spec.AconConformance._

/** Conformance sweep over the REFERENCE's entire test-resource config
  * corpus (`tests/resources/feature tree`): every JSON must either plan or
  * be classified (fixture / named rejection) — never an unexplained
  * rejection or a stack-trace escape. This is the breadth gate for the
  * user-facing config surface: residual field-spelling drift shows up
  * here as a named rejection instead of being found one bug at a time.
  */
class AconSweepSpec extends SparkSpec {

  private val root = new java.io.File("/root/reference/tests/resources/feature")

  private def walk(f: java.io.File) = TestFiles.walk(f, ".json")

  test("every reference feature-test JSON plans or is classified, with zero unexplained rejections") {
    assume(root.isDirectory, "reference test resources not present")
    val files = walk(root)
    assert(files.size > 400, s"expected the full corpus, saw ${files.size}")

    val outcomes: Seq[(String, Outcome)] = files.map { f =>
      val rel = f.getPath.stripPrefix(root.getPath + "/")
      val text = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      val out =
        try classify(spark, text)
        catch {
          case e: Throwable =>
            Rejected("classifier-escape", s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      rel -> out
    }

    val planned = outcomes.collect { case (p, Planned(k)) => (p, k) }
    val fixtures = outcomes.collect { case (p, Fixture(k)) => (p, k) }
    val rejected = outcomes.collect { case (p, r: Rejected) => (p, r) }

    val summary = outcomes
      .groupBy {
        case (_, Planned(k)) => s"planned:$k"
        case (_, Fixture(k)) => s"fixture:$k"
        case (_, Rejected(k, _)) => s"rejected:$k"
      }
      .map { case (k, v) => f"$k%-40s ${v.size}%4d" }
      .toSeq.sorted
    info(s"swept ${files.size} JSONs")
    summary.foreach(info(_))

    // The classifier must never escape with an exception — a rejection
    // needs a NAMED reason.
    val escapes = rejected.filter(_._2.kind == "classifier-escape")
    assert(escapes.isEmpty,
      "classifier escapes:\n" + escapes.map { case (p, r) => s"  $p: ${r.reason}" }.mkString("\n"))

    // Documented expected rejections — each entry is a (path-substring,
    // reason-substring) with the WHY:
    val expectedRejections: Seq[(String, String, String)] = Seq.empty

    val unexplained = rejected.filterNot { case (p, r) =>
      expectedRejections.exists { case (ps, rs, _) => p.contains(ps) && r.reason.contains(rs) }
    }
    assert(unexplained.isEmpty,
      "unexplained rejections:\n" +
        unexplained.map { case (p, r) => s"  $p [${r.kind}]: ${r.reason}" }.mkString("\n"))

    // The sweep must actually exercise the engine surface, not classify
    // everything away as fixtures: the corpus contains ~187 load ACONs,
    // ~60 manager configs, GAB configs and Spark schemas.
    assert(planned.count(_._2 == "acon") >= 180,
      s"only ${planned.count(_._2 == "acon")} ACONs planned")
    assert(planned.count(_._2 == "manager") >= 50,
      s"only ${planned.count(_._2 == "manager")} manager configs planned")
    assert(planned.count(_._2 == "spark-schema") >= 10)
    assert(planned.count(_._2 == "gab-config") >= 5)
  }
}
