package graft.dq

import graft.spec.{DQFunctionSpec, DQSpec, OutputSpec}
import org.apache.spark.sql.SparkSession

/** Exception raised when a PRISMA rules definition carries duplicated
  * `dq_rule_id`s (reference `dq_processors/exceptions.py`
  * DQDuplicateRuleIdException; raised from `algorithms/dq_validator.py:97`
  * and `algorithms/data_loader.py:246`). */
final class DQDuplicateRuleIdException(msg: String) extends RuntimeException(msg)

/** Exception for malformed PRISMA specs (reference
  * DQSpecMalformedException). */
final class DQSpecMalformedException(msg: String) extends RuntimeException(msg)

/** The reference's PRISMA data-quality variant
  * (`utils/dq_utils.py:18-284`): DQ rules are governed DATA, not config —
  * they live in a rules table keyed by `dq_rule_id`, filtered per run by
  * execution point (`in_motion` for loads, `at_rest` for stand-alone
  * validation) and target table, with rule metadata riding along as a
  * `meta` argument on every resolved expectation.
  *
  * Spec resolution (`build_prisma_dq_spec`) additionally pins the
  * result-sink contract: exploded layout, sink and processed-keys
  * locations derived from the DQ bucket + data product name, no critical
  * functions, fail_on_error defaulting to false, and the unexpected-rows
  * PK either given or derived from the target table's
  * `lakehouse.primary_key` property.
  *
  * Scale shape: the rules table is config-sized (driver collect is
  * bounded by rule count); everything data-sized stays in [[DQEngine]]'s
  * single-scan evaluation.
  */
object Prisma {

  /** Meta columns attached to every imported rule (reference
    * `configs/engine.yaml` dq_functions_column_list). */
  val MetaColumns: Seq[String] =
    Seq("dq_rule_id", "execution_point", "filters", "schema", "table",
      "column", "dimension")

  /** The DQ artifact bucket: `spark.graft.dqBucket` in prod
    * (`spark.graft.environment=prod`), `spark.graft.dqDevBucket`
    * otherwise — strictly, with NO cross-environment fallback, mirroring
    * the reference's selection (`utils/dq_utils.py:199-203`): a dev/test
    * PRISMA run must never append artifacts into the prod bucket just
    * because the dev bucket is unset. */
  def dqBucket(spark: SparkSession): Option[String] = {
    val conf = spark.conf
    val prod = conf.getOption("spark.graft.environment").contains("prod")
    if (prod) conf.getOption("spark.graft.dqBucket")
    else conf.getOption("spark.graft.dqDevBucket")
  }

  /** Resolve a PRISMA spec for one execution point. Non-prisma specs and
    * the engine-local `rules_table` spelling pass through untouched (the
    * latter keeps its historical resolution in the callers). */
  def resolve(spark: SparkSession, dq: DQSpec, executionPoint: String): DQSpec = {
    if (dq.dqType != "prisma" || dq.rulesTable.isDefined) return dq

    val fns =
      if (dq.dqDbTable.isDefined) loadRules(spark, dq, executionPoint)
      else if (dq.dqFunctions.nonEmpty) { validateMeta(dq, executionPoint); dq.dqFunctions }
      else throw new DQSpecMalformedException(
        "When using PRISMA either dq_db_table or dq_functions needs to be defined.")

    val dp = dq.dataProductName.getOrElse(throw new DQSpecMalformedException(
      "When using PRISMA DQ data_product_name must be defined."))
    if (dq.unexpectedRowsPk.isEmpty && dq.tblToDerivePk.isEmpty)
      throw new DQSpecMalformedException(
        "When using PRISMA DQ either tbl_to_derive_pk or unexpected_rows_pk " +
          "need to be defined.")
    val pk =
      if (dq.unexpectedRowsPk.nonEmpty) dq.unexpectedRowsPk
      else derivePk(spark, dq.tblToDerivePk.get)

    // sink + processed-keys locations derive from the bucket; an explicit
    // result_sink location is kept only when no bucket is configured
    val bucket = dqBucket(spark)
    val sinkLoc = bucket.map(b => s"$b/$dp/result_sink/")
      .orElse(dq.resultSink.flatMap(_.location))
    val keysLoc = bucket.map(b => s"$b/$dp/dq_processed_keys/")
      .orElse(dq.processedKeysLocation)
    val sinkFmt = dq.resultSink.flatMap(_.dataFormat).getOrElse("delta")

    dq.copy(
      dqFunctions = fns,
      criticalFunctions = Seq.empty,
      maxPercentageFailure = dq.maxPercentageFailure.orElse(Some(1.0)),
      resultSinkExplode = Some(true),
      resultSink = sinkLoc.map(loc => OutputSpec(
        specId = "result_sink", inputId = dq.specId, writeType = "append",
        dataFormat = Some(sinkFmt), location = Some(loc),
        options = dq.resultSink.map(_.options).getOrElse(Map.empty))),
      unexpectedRowsPk = pk,
      processedKeysLocation = keysLoc)
  }

  /** `PrismaUtils.validate_rule_id_duplication` (`utils/dq_utils.py:239-285`):
    * per PRISMA spec, report non-unique `dq_rule_id`s. The returned pairs
    * mirror the reference's error dict exactly — keyed
    * `"dq_spec_id: <spec_id>"`, valued with the duplicate GROUP BY rows
    * (table case, Python `str(Row)` rendering) or with EVERY inline rule
    * id joined by `"; "` (the reference reports the whole list, not just
    * the duplicates — pinned by `tests/unit/test_prisma_dq_rule_id.py`). */
  def ruleIdDuplication(spark: SparkSession, specs: Seq[DQSpec]): Seq[(String, String)] =
    specs.flatMap { dq =>
      if (dq.dqType != "prisma") None
      else dq.dqDbTable match {
        case Some(t) =>
          val rows = spark.sql(
            s"SELECT dq_rule_id, COUNT(*) AS count FROM $t " +
              "GROUP BY dq_rule_id HAVING COUNT(*) > 1")
            .collect().map(r => s"Row(dq_rule_id='${r.getString(0)}', count=${r.getLong(1)})")
          if (rows.isEmpty) None
          else Some(s"dq_spec_id: ${dq.specId}" -> rows.mkString("; "))
        case None if dq.dqFunctions.nonEmpty =>
          val ids = dq.dqFunctions.flatMap(f =>
            f.args.get("meta").collect { case m: Map[_, _] =>
              m.collectFirst { case (k, v) if String.valueOf(k) == "dq_rule_id" =>
                String.valueOf(v) } }.flatten)
          if (ids.distinct.length != ids.length)
            Some(s"dq_spec_id: ${dq.specId}" -> ids.mkString("; "))
          else None
        case None => None
      }
    }

  /** Python-dict repr of the error pairs — the reference interpolates the
    * raw dict into both raise messages. */
  def errorDictRepr(errs: Seq[(String, String)]): String =
    errs.map { case (k, v) => s"'$k': '$v'" }.mkString("{", ", ", "}")

  /** The stand-alone validator's raise (`algorithms/dq_validator.py:95-103`):
    * duplicated rule ids fail the run before any DQ executes. The data
    * loader's contract differs — see [[graft.algo.DataLoader]]: it skips
    * the DQ stage, still writes, and raises AFTER terminate
    * (`data_loader.py:245-253`). */
  def raiseOnDuplicates(spark: SparkSession, specs: Seq[DQSpec]): Unit = {
    val errs = ruleIdDuplication(spark, specs)
    if (errs.nonEmpty)
      throw new DQDuplicateRuleIdException(
        "Duplicate dq_rule_id detected in dq_spec definition.\n" +
          "We have identified one or more duplicate dq_rule_id entries in " +
          "the dq_spec definition. Please review and verify the following " +
          s"dq_rules:\n${errorDictRepr(errs)}")
  }

  /** `DQUtils.import_dq_rules_from_table`: filter by execution point and
    * target table, de-duplicate identical (function, arguments) rows
    * (kept-first, like drop_duplicates), parse the `arguments` JSON, and
    * attach the meta columns. */
  private def loadRules(
      spark: SparkSession, dq: DQSpec, executionPoint: String): Seq[DQFunctionSpec] = {
    val filter = dq.dqTableTableFilter.getOrElse(throw new DQSpecMalformedException(
      "When importing rules from a table dq_table_table_filter must be defined."))
    val extra = dq.dqTableExtraFilters.map(f => s" AND $f").getOrElse("")
    val metaSel = MetaColumns.map(c => s"`$c`").mkString(", ")
    val rows = spark.sql(
      s"SELECT `arguments`, `dq_tech_function`, $metaSel FROM ${dq.dqDbTable.get} " +
        s"WHERE `execution_point` = '$executionPoint' AND `table` = '$filter'$extra")
      .collect()
    val seen = scala.collection.mutable.LinkedHashMap[(String, String), DQFunctionSpec]()
    rows.foreach { r =>
      val fn = r.getString(1)
      val argsJson = Option(r.getString(0)).getOrElse("{}")
      val key = (fn, argsJson)
      if (!seen.contains(key)) {
        val meta = MetaColumns.zipWithIndex.flatMap { case (c, i) =>
          Option(r.get(i + 2)).map(v => c -> String.valueOf(v))
        }.toMap
        val args = graft.spec.Specs.parseJsonMap(argsJson) + ("meta" -> meta)
        seen(key) = DQFunctionSpec(fn, args)
      }
    }
    seen.values.toSeq
  }

  private def pyList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** `DQUtils.validate_dq_functions` (`utils/dq_utils.py:118-164`): inline
    * PRISMA rules must each carry a meta argument holding every configured
    * meta field, with the meta's own execution point matching the run's.
    * Messages render Python list reprs verbatim (found keys in JSON
    * insertion order, the diff sorted) — pinned by
    * `tests/unit/test_prisma_function_definition.py`. */
  private[graft] def validateMeta(dq: DQSpec, executionPoint: String = ""): Unit =
    dq.dqFunctions.foreach { f =>
      // toSeq keeps the meta's own key order (ListMap / ordered parse)
      // for the reference's "Found fields" rendering
      val meta = f.args.get("meta").collect { case m: Map[_, _] =>
        m.toSeq.map { case (k, v) => String.valueOf(k) -> v } }
      meta match {
        case None => throw new DQSpecMalformedException(
          "The dq function must have a meta field containing all the " +
            s"fields defined: ${pyList(MetaColumns)}.")
        case Some(kv) =>
          val keys = kv.map(_._1)
          val missing = (MetaColumns.toSet -- keys.toSet).toSeq.sorted
          if (missing.nonEmpty)
            throw new DQSpecMalformedException(
              "The dq function meta field must contain all the " +
                s"fields defined: ${pyList(MetaColumns)}.\n" +
                s"Found fields: ${pyList(keys)}.\n" +
                s"Diff: ${pyList(missing)}")
          if (executionPoint.nonEmpty && kv.collectFirst {
                case ("execution_point", v) => String.valueOf(v)
              }.exists(_ != executionPoint))
            throw new DQSpecMalformedException(
              "The dq function execution point must be the same as " +
                "the execution point of the dq spec.")
      }
    }

  /** Derive the unexpected-rows PK from a table's
    * `lakehouse.primary_key` property (reference `tbl_to_derive_pk`). */
  def derivePk(spark: SparkSession, table: String): Seq[String] = {
    val rows = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
    rows.collectFirst {
      case r if r.getString(0) == "lakehouse.primary_key" =>
        r.getString(1).split(",").toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`").trim)
          .filter(_.nonEmpty)
    }.getOrElse(throw new DQSpecMalformedException(
      s"tbl_to_derive_pk: table $table has no lakehouse.primary_key property"))
  }

  /** PRISMA processed-keys sink (`dq_factory.py:359-371`): after a run,
    * the source rows' PK tuples (cast to string) are appended with the
    * run name so downstream can count the good records each run covered.
    * Only the PRISMA dq type writes processed keys (`dq_factory.py:362`) —
    * a validator spec carrying the field gets no extra append. */
  def writeProcessedKeys(
      spark: SparkSession, dq: DQSpec,
      df: org.apache.spark.sql.DataFrame, runName: String): Unit =
    if (dq.dqType == "prisma") dq.processedKeysLocation.foreach { loc =>
      import org.apache.spark.sql.functions.{col, lit}
      if (dq.unexpectedRowsPk.nonEmpty) {
        val keys = df
          .select(dq.unexpectedRowsPk.map(c => col(c).cast("string").as(c)): _*)
          .withColumn("run_name", lit(runName))
        keys.write.mode("append").parquet(loc)
      }
    }
}
