package graft.spec

import org.apache.spark.sql.SparkSession

/** Plan-only conformance check over the reference's user-facing config
  * surface — the ACON (and manager / GAB / schema) JSONs a real user
  * hands the engine.
  *
  * `classify` takes one JSON document and decides, WITHOUT executing any
  * IO, whether the engine would accept it: specs parse, data formats are
  * recognized, transformer / DQ-expectation / terminator names resolve
  * in their registries, and the spec-id dataflow graph is well-formed.
  * Non-config documents (data fixtures, expected-output controls, Spark
  * schema files) are classified as fixtures, not rejected — the
  * reference's test resources mix configs and fixtures freely.
  *
  * The point (round-10 verdict, "Next round #3"): the reference's test
  * resources ARE its config surface, and spelling/shape drift is found
  * one field at a time unless the whole corpus is swept. AconSweepSpec
  * walks `tests/resources/feature tree` and fails on any rejection that
  * is not an explicitly documented expectation.
  */
object AconConformance {

  sealed trait Outcome { def kind: String }
  /** The engine accepts this config (plan-level). */
  final case class Planned(kind: String) extends Outcome
  /** The engine rejects this config, with the named reason. */
  final case class Rejected(kind: String, reason: String) extends Outcome
  /** Not an engine config: test data / control / schema fixture. */
  final case class Fixture(kind: String) extends Outcome

  /** Classify one JSON document (see object doc). */
  def classify(spark: SparkSession, json: String): Outcome = {
    val parsed =
      try Right(Specs.parseJsonAny(json))
      catch { case e: Exception => Left(e) }
    parsed match {
      case Left(_) if looksLikeJsonLines(json) => Fixture("jsonl-data")
      case Left(e) => Rejected("unparseable", s"not JSON: ${e.getMessage.take(80)}")
      case Right(_: Seq[_]) => Fixture("data-rows")
      case Right(_: collection.Map[_, _]) => classifyObject(spark, Specs.parseJsonMap(json))
      case Right(_) => Fixture("scalar")
    }
  }

  /** A file that is not one JSON document but every line is (the
    * reference's control fixtures are often JSON-lines dumps). */
  private def looksLikeJsonLines(text: String): Boolean = {
    val lines = text.split('\n').map(_.trim).filter(_.nonEmpty)
    lines.nonEmpty && lines.forall { l =>
      try { Specs.parseJsonAny(l); true }
      catch { case _: Exception => false }
    }
  }

  private def classifyObject(spark: SparkSession, m: Map[String, Any]): Outcome = {
    if (m.contains("input_specs") || m.contains("output_specs"))
      planAcon(spark, m)
    else if (m.contains("acon"))
      // expected-output control wrapping an acon (engine_usage_stats
      // records `{"acon": ..., "function": "<entrypoint>", ...}`): the
      // wrapper is a fixture, but the embedded acon should still plan —
      // checked BEFORE the flat-manager branch, whose `function` key the
      // wrapper's entrypoint name would shadow
      m("acon") match {
        case em: collection.Map[_, _] =>
          classifyObject(spark,
            em.map { case (k, v) => String.valueOf(k) -> v }.toMap) match {
            case Planned(k) => Fixture(s"control-wrapping-plannable-$k")
            case r: Rejected => r.copy(kind = "control-wrapped-" + r.kind)
            case f: Fixture => f
          }
        case _ => Fixture("control")
      }
    else if (m.contains("operations"))
      planManager(Specs.A.seqOfMaps(m, "operations"))
    else if (m.contains("function"))
      planFlatManagerOp(m)
    else if (Specs.A.str(m, "type").contains("struct") && m.contains("fields"))
      planSparkSchema(m)
    else if (m.contains("lookup_table") || m.contains("query_label_filter"))
      planGabConfig(m)
    else Fixture("data-record")
  }

  // ---- ACON (load_data) ----------------------------------------------

  private def planAcon(spark: SparkSession, m: Map[String, Any]): Outcome = {
    val acon =
      try Specs.parseAcon(Specs.renderJson(m))
      catch { case e: Exception => return Rejected("acon", s"parse: ${e.getMessage}") }
    try AconValidation.validate(acon)
    catch { case e: Exception => return Rejected("acon", s"format: ${e.getMessage}") }

    // dataflow graph: every input_id must reference an already-defined
    // spec id (inputs first, then transforms in order, dq specs rename
    // downstream consumption to their own spec id)
    var known = acon.inputSpecs.map(_.specId).toSet
    acon.transformSpecs.foreach { t =>
      if (!known(t.inputId))
        return Rejected("acon", s"unresolved input_id '${t.inputId}' (transform '${t.specId}')")
      known += t.specId
    }
    acon.dqSpecs.foreach { d =>
      if (!known(d.inputId))
        return Rejected("acon", s"unresolved input_id '${d.inputId}' (dq '${d.specId}')")
      known += d.specId
    }
    acon.outputSpecs.foreach { o =>
      if (!known(o.inputId))
        return Rejected("acon", s"unresolved input_id '${o.inputId}' (output '${o.specId}')")
    }

    for (t <- acon.transformSpecs; fn <- t.transformers)
      if (!graft.transform.Transformers.isKnown(fn.function))
        return Rejected("acon", s"unknown transformer: ${fn.function}")
    for (d <- acon.dqSpecs; fn <- d.dqFunctions ++ d.criticalFunctions)
      if (!graft.dq.DQEngine.knownExpectation(spark, fn.function))
        return Rejected("acon", s"unknown dq function: ${fn.function}")
    for (t <- acon.terminateSpecs)
      if (!graft.algo.Terminators.Known(t.function))
        return Rejected("acon", s"unknown terminator: ${t.function}")
    Planned("acon")
  }

  // ---- manager configs -----------------------------------------------

  private def planManager(ops: Seq[Map[String, Any]]): Outcome = {
    if (ops.isEmpty) return Rejected("manager", "No operations found in the acon.")
    val errors = graft.maintain.ManagerDispatch.validationErrors(ops)
    if (errors.isEmpty) Planned("manager")
    else Rejected("manager", errors.mkString("; "))
  }

  /** Flat reference-style manager config: `{"function": ..., args...}`,
    * manager type implied by the entrypoint — inferred here. */
  private def planFlatManagerOp(m: Map[String, Any]): Outcome = {
    val fn = Specs.A.str(m, "function").get
    graft.maintain.ManagerDispatch.inferManager(fn) match {
      case None => Rejected("manager", s"Function '$fn' not supported for any manager")
      case Some(mgr) =>
        // flat acons are never TYPE-validated in the reference (see
        // ManagerDispatch.execute scaladoc) — membership + mandatory only
        val errors = graft.maintain.ManagerDispatch.validationErrors(
          Seq(m + ("manager" -> mgr)), strictTypes = false)
        if (errors.isEmpty) Planned("manager")
        else Rejected("manager", errors.mkString("; "))
    }
  }

  // ---- other config families -----------------------------------------

  private def planSparkSchema(m: Map[String, Any]): Outcome =
    try {
      org.apache.spark.sql.types.DataType.fromJson(Specs.renderJson(m))
      Planned("spark-schema")
    } catch {
      case e: Exception => Rejected("spark-schema", e.getMessage.take(120))
    }

  private def planGabConfig(m: Map[String, Any]): Outcome = {
    val required = Seq("lookup_table", "target_database")
    val missing = required.filterNot(m.contains)
    if (missing.nonEmpty)
      Rejected("gab-config", s"missing: ${missing.mkString(", ")}")
    else Planned("gab-config")
  }
}
