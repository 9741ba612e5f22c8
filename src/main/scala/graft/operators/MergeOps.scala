package graft.operators

import graft.spec.MergeOptions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merge (upsert) semantics as a pure DataFrame operator.
  *
  * Capability parity with the reference's Delta MERGE writer
  * (`lakehouse_engine/io/writers/delta_merge_writer.py:28-210`): matched
  * delete / matched update (full or per-column set, optionally predicated)
  * / not-matched insert (optionally insert_only). This environment ships
  * no Delta jars, so the engine expresses MERGE as a keyed full-outer join
  * and the writers persist the result transactionally (stage + swap).
  *
  * Scale notes: the join shuffles both sides on the merge key — the same
  * partitioning Delta's low-shuffle merge would use for touched files.
  * Merge conditions are written against struct aliases `t` (target) and
  * `s` (source); equality conditions on struct fields are extracted by
  * Catalyst as equi-join keys, so the plan is a shuffle/sort-merge join,
  * never a cartesian product. For 100 TB targets, pre-bucketing the
  * target table on the merge key makes this a co-located join.
  */
object MergeOps {

  /** Delta-style MERGE of `source` into `target` on key equality. */
  def merge(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      updateCondition: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      deleteCondition: Option[Column] = None,
      insertCondition: Option[Column] = None,
      insertOnly: Boolean = false,
      insertSet: Map[String, Column] = Map.empty): DataFrame =
    mergeWithCondition(target, source,
      keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _),
      updateCondition, updateSet, deleteCondition, insertCondition, insertOnly,
      insertSet, equiKeys = Some(keys.map(_ -> true)))

  /** MERGE from a declarative [[MergeOptions]] spec whose predicates use
    * the reference's `current.` / `new.` aliases. */
  def mergeWithOptions(target: DataFrame, source: DataFrame, opts: MergeOptions): DataFrame = {
    def tr(p: String): Column = expr(translateAliases(p))
    mergeWithCondition(target, source,
      tr(opts.mergePredicate),
      updateCondition = opts.updatePredicate.map(tr),
      updateSet = opts.updateColumnSet.map { case (c, e) => c -> tr(e) },
      deleteCondition = opts.deletePredicate.map(tr),
      insertCondition = opts.insertPredicate.map(tr),
      insertOnly = opts.insertOnly,
      insertSet = opts.insertColumnSet.map { case (c, e) => c -> tr(e) },
      equiKeys = equiKeysOf(opts.mergePredicate))
  }

  /** When the merge predicate is PURELY a conjunction of same-column
    * equalities (`current.k = new.k` / `<=>`, either order), the key list
    * with each key's null-safety — the common CDC-upsert shape, which
    * lets the multiple-match guard run on the source side instead of the
    * joined set (see [[mergeWithCondition]]). Any OR, theta conjunct, or
    * cross-column equality yields None (guard falls back to the general
    * path). */
  private[operators] def equiKeysOf(predicate: String): Option[Seq[(String, Boolean)]] = {
    val p = predicate.toLowerCase(java.util.Locale.ROOT)
    if (p.matches("(?s).*\\bor\\b.*")) return None
    val conjuncts = p.split("\\band\\b").map(_.trim.stripPrefix("(").stripSuffix(")").trim)
    val ident = "([a-z_][a-z0-9_]*)"
    val fwd = s"current\\.$ident\\s*(=|<=>)\\s*new\\.$ident".r
    val rev = s"new\\.$ident\\s*(=|<=>)\\s*current\\.$ident".r
    val keys = conjuncts.toSeq.map {
      case fwd(a, op, b) if a == b => Some(a -> (op == "<=>"))
      case rev(a, op, b) if a == b => Some(a -> (op == "<=>"))
      case _ => None
    }
    if (keys.forall(_.isDefined) && keys.nonEmpty) Some(keys.flatten.distinctBy(_._1))
    else None
  }

  /** Delta schema auto-merge (`spark.databricks.delta.schema.autoMerge
    * .enabled`, the conf the reference's schema-evolution acons set —
    * `tests/feature/test_schema_evolution.py`): align target and source
    * schemas before the merge.
    *
    *   - columns only in the SOURCE are appended to the target schema
    *     (pre-existing target rows read NULL for them);
    *   - columns only in the TARGET are kept — inserted rows read NULL,
    *     and an update-all (`UPDATE SET *`) keeps the target's value for
    *     them rather than nulling it out;
    *   - explicit update/insert column sets are left untouched (they name
    *     their assignments, evolution only widens the schema).
    *
    * Returns the merge inputs unchanged when the column sets already
    * agree (case-insensitive, matching Spark's default resolution).
    * Without auto-merge the engine keeps Delta's strict behavior: extra
    * source columns are silently ignored and a missing source column
    * fails the merge's analysis. */
  def evolveForAutoMerge(
      target: DataFrame,
      source: DataFrame,
      opts: MergeOptions): (DataFrame, DataFrame, MergeOptions) = {
    val tSet = target.columns.map(_.toLowerCase).toSet
    val sSet = source.columns.map(_.toLowerCase).toSet
    val added = source.columns.toSeq.filterNot(c => tSet(c.toLowerCase))
    val removed = target.columns.toSeq.filterNot(c => sSet(c.toLowerCase))
    if (added.isEmpty && removed.isEmpty) (target, source, opts)
    else {
      val target2 = added.foldLeft(target)((d, c) =>
        d.withColumn(c, lit(null).cast(source.schema(c).dataType)))
      val source2 = removed.foldLeft(source)((d, c) =>
        d.withColumn(c, lit(null).cast(target.schema(c).dataType)))
      val opts2 =
        if (removed.isEmpty || opts.insertOnly || opts.updateColumnSet.nonEmpty) opts
        else {
          // key by the TARGET's casing (updateSet lookups are exact-match)
          val tByLower = target.columns.map(c => c.toLowerCase -> c).toMap
          opts.copy(updateColumnSet = source.columns.toSeq
            .map(c => tByLower.getOrElse(c.toLowerCase, c) -> s"new.$c").toMap)
        }
      (target2, source2, opts2)
    }
  }

  /** Rewrite `current.x` / `new.x` references to the internal `t`/`s`
    * struct aliases. Quote-aware: occurrences inside single/double-quoted
    * string literals or backquoted identifiers (e.g. `status = 'new.pending'`)
    * are left untouched; word-boundary safe outside quotes. */
  private[operators] def translateAliases(predicate: String): String = {
    val sb = new StringBuilder(predicate.length)
    val n = predicate.length
    var i = 0
    var quote: Char = 0 // 0 = outside quotes; else the active quote char
    def isWordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < n) {
      val c = predicate.charAt(i)
      if (quote != 0) {
        sb += c
        if (c == '\\' && i + 1 < n) { sb += predicate.charAt(i + 1); i += 1 }
        else if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; sb += c; i += 1
      } else {
        val boundary = i == 0 || !isWordChar(predicate.charAt(i - 1))
        def at(kw: String): Boolean =
          boundary && predicate.regionMatches(true, i, kw, 0, kw.length)
        if (at("current.")) { sb ++= "t."; i += 8 }
        else if (at("new.")) { sb ++= "s."; i += 4 }
        else { sb += c; i += 1 }
      }
    }
    sb.toString
  }

  /** General MERGE on an arbitrary condition over `t`/`s` struct aliases.
    *
    * @param condition       match condition (use `col("t.k") === col("s.k")`)
    * @param updateCondition extra predicate for the matched-update clause
    * @param updateSet       columns to update on match (empty = all source)
    * @param deleteCondition matched rows satisfying this are dropped
    * @param insertCondition not-matched source rows must satisfy this
    * @param insertOnly      suppress all matched actions (append-new-only)
    * @param insertSet       columns to set on insert (empty = all source;
    *                        unnamed target columns become NULL, the
    *                        `whenNotMatchedInsert(values=...)` contract —
    *                        `io/writers/delta_merge_writer.py:91-105`)
    */
  def mergeWithCondition(
      target: DataFrame,
      source: DataFrame,
      condition: Column,
      updateCondition: Option[Column] = None,
      updateSet: Map[String, Column] = Map.empty,
      deleteCondition: Option[Column] = None,
      insertCondition: Option[Column] = None,
      insertOnly: Boolean = false,
      insertSet: Map[String, Column] = Map.empty,
      equiKeys: Option[Seq[(String, Boolean)]] = None): DataFrame = {
    val dataCols = target.columns.toSeq
    val t = target.select(struct(dataCols.map(col): _*).as("t"))
    // the target schema is authoritative: source columns are cast to the
    // target's types, as Delta MERGE does under the default ANSI
    // storeAssignmentPolicy. Delta's ANSI store assignment FAILS on
    // un-castable values; plain Column.cast only does so when the session
    // runs ANSI (Spark 4's default) and silently nulls otherwise — the
    // raise_error guard keeps the fail-loud contract independent of the
    // session's ansi.enabled setting (same-type columns pass through
    // untouched, so the guard costs nothing on the common path).
    //
    // Like Delta, the cast is PER-CLAUSE, not per-row: only columns the
    // join CONDITION references are cast eagerly (the match itself needs
    // target-typed keys); every other column stays raw in the `s` struct
    // and is cast inside the branch that assigns it — a row destined for
    // the delete clause, or filtered out by the insert predicate, never
    // evaluates the guard for values those clauses don't use.
    val targetTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val sourceTypes = source.schema.map(f => f.name -> f.dataType).toMap
    def guardedCast(src: Column, c: String): Column = {
      val tgtType = targetTypes(c)
      val casted = src.cast(tgtType)
      when(src.isNotNull && casted.isNull,
        raise_error(concat(
          lit(s"merge: cannot cast column '$c' value '"),
          src.cast("string"), lit(s"' to ${tgtType.sql}"))))
        .otherwise(casted)
    }
    val condRefs: Set[String] = org.apache.spark.sql.graft.ColumnRefs.names(condition)
    def eagerlyCast(c: String): Boolean =
      sourceTypes.get(c).contains(targetTypes(c)) || condRefs.contains(c)
    val s = source.select(struct(
      dataCols.map { c =>
        if (sourceTypes.get(c).contains(targetTypes(c))) col(c).as(c)
        else if (condRefs.contains(c)) guardedCast(col(c), c).as(c)
        else col(c).as(c)
      }: _*).as("s"))
    // target-typed view of the source row, for the branches that assign it
    def sCast = struct(dataCols.map { c =>
      if (eagerlyCast(c)) col(s"s.$c").as(c)
      else guardedCast(col(s"s.$c"), c).as(c)
    }: _*)

    // insert_column_set: named columns take their expression (cast to the
    // target type, as Delta's store assignment would), unnamed columns are
    // NULL — not the source value
    val insertedStruct =
      if (insertSet.isEmpty) sCast
      else struct(dataCols.map { c =>
        insertSet.get(c).map(_.cast(targetTypes(c)))
          .getOrElse(lit(null).cast(targetTypes(c))).as(c)
      }: _*)

    if (insertOnly) {
      // WHEN NOT MATCHED ... INSERT only: the target passes through
      // untouched (no shuffle, no join) and only the source is anti-joined
      // against it. This also makes multi-match trivially sound — a target
      // row matched by N source rows is emitted exactly once, where the
      // full-outer formulation would emit it once per matched pair.
      val anti = s.join(t, condition, "left_anti")
      val filtered = insertCondition.fold(anti)(anti.where)
      return target.unionAll(
        filtered.select(insertedStruct.as("r")).select(col("r.*")))
    }

    val matched = col("t").isNotNull && col("s").isNotNull
    val sourceOnly = col("t").isNull && col("s").isNotNull

    // Multiple-match guard, mirroring Delta MERGE's runtime contract
    // (DeltaErrors.multipleSourceRowMatchingTargetRowInMergeException,
    // surfaced by the reference through `delta_merge_writer.py:110-139`):
    // a target row matched by more than one source row is non-deterministic
    // to update/delete, so the merge FAILS — except when the merge is an
    // unconditional delete (Delta's special case: deleting the same row
    // twice is idempotent).
    //
    // Cost model, in order:
    //  - pure equi-key merge (the CDC-upsert hot path): per-key source
    //    multiplicity IS the per-target-row match count, so `__n` is a
    //    window over the SOURCE ONLY — the guard's extra shuffle moves
    //    just the source (the small delta in a CDC merge), never the
    //    target. (The window partitions by the SMJ's own key rewrite so
    //    the exchange COULD be shared, but Spark pre-projects window
    //    partition expressions into `_w` aliases, which hides the
    //    equivalence from EnsureRequirements — hence source-shuffle
    //    cost, not zero.)
    //  - general theta condition: a count over the joined set keyed by
    //    the target-row id (unmatched rows get singleton partitions via
    //    the unique negative __sid — no skew). One extra shuffle of the
    //    joined set (target + source), the price Delta pays in its own
    //    multiple-match detection join.
    val unconditionalDelete =
      deleteCondition.exists(org.apache.spark.sql.graft.ColumnRefs.isTrueLiteral)
    val targetTypeCI = target.schema.map(f => f.name.toLowerCase -> f.dataType).toMap
    // Partition the source-side window by the SAME expressions the SMJ's
    // key extraction produces — plain `s.k` for `=`, the
    // `(coalesce(s.k, default), isnull(s.k))` rewrite for `<=>` — so the
    // window's exchange IS the join's exchange. None when a key's type
    // has no default literal or the key is unknown (fall back to the
    // joined-set window).
    def equiPartExprs(keys: Seq[(String, Boolean)]): Option[Seq[Column]] =
      scala.util.Try(keys.flatMap { case (k, nullSafe) =>
        if (nullSafe) Seq(
          coalesce(col(s"s.$k"), org.apache.spark.sql.graft.ColumnRefs
            .defaultLiteral(targetTypeCI(k.toLowerCase))),
          isnull(col(s"s.$k")))
        else Seq(col(s"s.$k"))
      }).toOption
    val joined = (equiKeys.flatMap(equiPartExprs), unconditionalDelete) match {
      case (_, true) =>
        t.join(s, condition, "full_outer").withColumn("__n", lit(1L))
      case (Some(partExprs), _) =>
        val sw = s.withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(partExprs: _*)))
        t.join(sw, condition, "full_outer")
      case (None, _) =>
        // row identities exist ONLY on this path — the tiered fast paths
        // never pay for them: __tid names the target row the count is
        // per; the unique negative __sid gives every unmatched row its
        // own singleton window partition (no skew, no collision)
        val tt = t.withColumn("__tid", monotonically_increasing_id())
        val ss = s.withColumn("__sid", -monotonically_increasing_id() - 1L)
        tt.join(ss, condition, "full_outer").withColumn("__n",
          count(when(matched, lit(1))).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(coalesce(col("__tid"), col("__sid")))))
    }

    val updatedStruct =
      if (updateSet.isEmpty) sCast
      else struct(dataCols.map(c => updateSet.getOrElse(c, col(s"t.$c")).as(c)): _*)

    val matchedResult = {
      val afterUpdate = updateCondition match {
        case Some(u) => when(u, updatedStruct).otherwise(col("t"))
        case None => updatedStruct
      }
      deleteCondition match {
        case Some(d) => when(d, lit(null)).otherwise(afterUpdate)
        case None => afterUpdate
      }
    }

    val keep = when(matched && col("__n") > 1, raise_error(concat(
        lit("merge: "), col("__n").cast("string"),
        lit(" source rows matched the same target row; matched clauses" +
          " cannot be applied deterministically (Delta MERGE" +
          " multiple-source-row-match contract)"))))
      .when(matched, matchedResult)
      .when(sourceOnly,
        insertCondition match {
          case Some(i) => when(i, insertedStruct).otherwise(lit(null))
          case None => insertedStruct
        })
      .otherwise(col("t"))

    joined.select(keep.as("r")).where(col("r").isNotNull).select(col("r.*"))
  }
}
