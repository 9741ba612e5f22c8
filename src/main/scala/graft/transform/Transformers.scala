package graft.transform

import graft.operators.Condense
import graft.spec.Specs.A._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Context a transformer chain executes in: the session, sibling spec
  * outputs by id (for join/union/incremental), and programmatically
  * registered custom functions. */
final case class TransformContext(
    spark: SparkSession,
    data: String => DataFrame = _ => sys.error("no sibling data available"),
    customFns: Map[String, DataFrame => DataFrame] = Map.empty)

/** The transformer registry: named, parameterized DataFrame -> DataFrame
  * operators.
  *
  * Capability parity with the reference's transformer factory
  * (`lakehouse_engine/transformers/transformer_factory.py:36-118`) — every
  * ACON transformer name from SURVEY.md §2.3–2.6 resolves here to a pure
  * declarative DataFrame operation, so Catalyst keeps full pushdown /
  * pruning / codegen visibility through the whole chain.
  */
object Transformers {

  /** Transformers that cannot run on a streaming DataFrame and must be
    * re-planned into foreachBatch (reference `transformer_factory.py:29-34`). */
  val StreamingUnsupported: Set[String] =
    Set("condense_record_mode_cdc", "group_and_rank", "with_row_id",
      "with_auto_increment_id", "sql_transformation",
      // corpus-statistics curation stages: their filters derive from a
      // full pass over the input, so they carry per-micro-batch
      // semantics and must run inside foreachBatch
      "minhash_dedup", "perplexity_filter", "importance_filter",
      // tokenizer/packing/export stages: corpus-wide training or
      // zipWithIndex ranking — batch (or foreachBatch) only
      "bpe_tokenize", "sequence_pack", "shard_export")

  /** Name-dispatch check used by the plan-only ACON conformance pass:
    * does this transformer name resolve in the registry at all? Probes
    * [[resolve]] with empty args so the check can never drift from the
    * match — argument errors (missing keys, null ctx) count as KNOWN;
    * only the registry's own unknown-name rejection is surfaced. */
  def isKnown(name: String): Boolean =
    try { resolve(name, Map.empty, TransformContext(null)); true }
    catch {
      case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.startsWith("unknown transformer") => false
      case _: Throwable => true
    }

  /** Resolve a transformer name + args into a DataFrame function. */
  def resolve(name: String, args: Map[String, Any], ctx: TransformContext): DataFrame => DataFrame = name match {

    // ---- projections / row-level (§2.3) --------------------------------
    case "column_selector" => df => {
      val cols = strMapOrdered(args, "cols")
      df.select(cols.map { case (c, a) => col(c).as(a) }: _*)
    }
    case "column_filter_exp" => df => df.selectExpr(strSeq(args, "exp"): _*)
    case "expression_filter" => df => df.filter(str(args, "exp").get)
    case "incremental_filter" => df => {
      val c = str(args, "input_col").get
      val op = if (bool(args, "greater_or_equal")) ">=" else ">"
      val increment: Column = str(args, "increment_df") match {
        case Some(sibling) =>
          // 1-row driver collect of the sibling's max, as in the reference
          // (`transformers/filters.py:71-79`)
          val incCol = str(args, "increment_col").getOrElse("latest")
          lit(ctx.data(sibling).select(incCol).collect()(0).get(0))
        case None => lit(args("increment_value") match {
          case n: Number => n
          case s => s.toString
        })
      }
      if (op == ">=") df.filter(col(c) >= increment) else df.filter(col(c) > increment)
    }
    case "drop_duplicate_rows" => df => {
      val cols = strSeq(args, "cols")
      // reference shape is a nested `watermarker: {col, watermarking_time}`
      // (`transformers/filters.py:150-155`); the engine-local flat
      // watermark_col/watermark_delay spellings stay accepted
      val wmRef = anyMap(args, "watermarker")
      val watermarked =
        if (wmRef.nonEmpty)
          df.withWatermark(String.valueOf(wmRef("col")),
            String.valueOf(wmRef("watermarking_time")))
        else str(args, "watermark_col") match {
          case Some(wc) => df.withWatermark(wc, str(args, "watermark_delay").getOrElse("10 minutes"))
          case None => df
        }
      if (cols.isEmpty) watermarked.dropDuplicates()
      else watermarked.dropDuplicates(cols)
    }
    case "cast" => df =>
      strMapOrdered(args, "cols").foldLeft(df) { case (d, (c, t)) =>
        // the reference takes Spark TYPE CLASS names ("StringType",
        // `column_reshapers.py:30-47` getattr(spark_types, t)()); DDL
        // names stay accepted
        val ddl = t match {
          case "StringType" => "string"
          case "IntegerType" => "int"
          case "LongType" => "bigint"
          case "ShortType" => "smallint"
          case "ByteType" => "tinyint"
          case "DoubleType" => "double"
          case "FloatType" => "float"
          case "BooleanType" => "boolean"
          case "DateType" => "date"
          case "TimestampType" => "timestamp"
          case "BinaryType" => "binary"
          case other => other
        }
        d.withColumn(c, col(c).cast(ddl))
      }
    case "rename" => df =>
      strMapOrdered(args, "cols").foldLeft(df) { case (d, (c, n)) =>
        d.withColumnRenamed(c, n)
      }
    case "with_expressions" => df => {
      // reference key is `cols_and_exprs` (`column_creators.py`); the
      // engine-local `cols` spelling stays accepted
      val pairs = strMapOrdered(args, "cols_and_exprs") match {
        case s if s.nonEmpty => s
        case _ => strMapOrdered(args, "cols")
      }
      pairs.foldLeft(df) { case (d, (c, e)) => d.withColumn(c, expr(e)) }
    }
    case "with_literals" => df =>
      anyMap(args, "literals").toSeq.foldLeft(df) { case (d, (c, v)) =>
        d.withColumn(c, lit(v))
      }
    case "with_row_id" => df =>
      df.withColumn(str(args, "output_col").getOrElse("lhe_row_id"),
        monotonically_increasing_id())
    case "with_auto_increment_id" => df => {
      val out = str(args, "output_col").getOrElse("lhe_row_id")
      // consecutive 0-based id via zipWithIndex (the reference's own shape,
      // `transformers/column_creators.py:46-83`): one lightweight job
      // counts rows per partition, then offsets are added per-partition —
      // fully distributed, unlike a row_number window over a constant
      // partition which funnels every row through ONE task
      val schema = df.schema.add(out, org.apache.spark.sql.types.LongType,
        nullable = false)
      val zipped = df.rdd.zipWithIndex.map { case (row, idx) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ idx)
      }
      ctx.spark.createDataFrame(zipped, schema)
    }
    case "flatten_schema" => df =>
      SchemaTools.flatten(df,
        // reference key is `max_level` (`column_reshapers.py:72-84`);
        // the engine-local `max_depth` spelling stays accepted
        num(args, "max_level").orElse(num(args, "max_depth"))
          .map(_.toInt).getOrElse(10),
        str(args, "separator").getOrElse("_"))
    case "explode_columns" => df => {
      // reference order (`column_reshapers.py:147-155`): arrays FIRST,
      // then maps — an array<map> column explodes to a map and can then
      // be map-exploded in the same call; map detection must therefore
      // run AFTER the array pass
      val arrayCols =
        if (bool(args, "explode_arrays"))
          df.schema.fields.filter(_.dataType.typeName == "array").map(_.name).toSeq
        else strSeq(args, "array_cols_to_explode")
      val afterArrays = arrayCols.foldLeft(df)((d, c) =>
        d.withColumn(c, explode_outer(col(c))))
      val mapCols =
        if (bool(args, "explode_maps"))
          afterArrays.schema.fields.filter(_.dataType.typeName == "map").map(_.name).toSeq
        else strSeq(args, "map_cols_to_explode")
      mapCols.foldLeft(afterArrays)((d, c) =>
        d.withColumn(c, explode_outer(map_entries(col(c)))))
    }
    case "from_json" => df => {
      val in = str(args, "input_col").get
      // reference contract (`column_reshapers.py:349-362`): the parsed
      // struct lands in `<input_col>_json`, original columns kept;
      // drop_all_cols keeps ONLY the new column. output_col remains an
      // engine-local override.
      val out = str(args, "output_col").getOrElse(in + "_json")
      // schema: DDL string, StructType-JSON string, or the reference's
      // DICT form (the parsed JSON object itself — re-render it)
      val schema = args.get("schema").map {
        case m: collection.Map[_, _] =>
          SchemaTools.schemaFromJson(graft.spec.Specs.renderJson(m))
        case s => SchemaTools.schemaFromAny(String.valueOf(s))
      }.get
      val opts = strMap(args, "options") ++ strMap(args, "json_options")
      val parsed = from_json(col(in).cast("string"), schema, opts)
      val withCol = df.withColumn(out, parsed)
      if (bool(args, "drop_all_cols")) withCol.select(col(out)) else withCol
    }
    case "to_json" => df => {
      val inCols = strSeq(args, "in_cols") match {
        case Seq("*") | Seq() => df.columns.toSeq
        case cs => cs
      }
      df.withColumn(str(args, "out_col").getOrElse("payload"),
        to_json(struct(inCols.map(col): _*), strMap(args, "options")))
    }
    case "from_avro" => df => {
      val in = str(args, "input_col").getOrElse("value")
      val out = str(args, "output_col").getOrElse(in)
      df.withColumn(out,
        graft.functions.AvroCodec.fromAvro(col(in), str(args, "schema").get))
    }
    case "to_avro" => df => {
      val inCols = strSeq(args, "in_cols")
      val out = str(args, "out_col").getOrElse("value")
      val schema = str(args, "schema").get
      val input = if (inCols.isEmpty) col(str(args, "input_col").get)
        else struct(inCols.map(col): _*)
      df.withColumn(out, graft.functions.AvroCodec.toAvro(input, schema))
    }
    // Resolves subjects through the pluggable SchemaRegistry transport
    // ONCE, driver-side, then decodes as plain Avro — executors never talk
    // to the registry (reference `column_reshapers.py:284-346`, where the
    // Databricks from_avro overload resolves per-query instead).
    case "from_avro_with_registry" => df => {
      val registry = graft.io.SchemaRegistry.resolve(str(args, "schema_registry").get)
      val valueCol = str(args, "value_col").getOrElse("value")
      val keyCol = str(args, "key_col").getOrElse("key")
      val keySubject = str(args, "key_schema")
      val passthrough = df.columns.toSeq
        .filterNot(c => c == valueCol || (keySubject.isDefined && c == keyCol))
      // wire_format: payloads carry the Confluent 5-byte header (magic +
      // schema id), as the reference's Databricks from_avro-with-registry
      // wire shape does; default stays plain Avro for raw payloads
      val framed = bool(args, "wire_format")
      def decodeWith(c: org.apache.spark.sql.Column, subj: String) =
        if (framed) {
          val rs = registry.latest(subj)
          graft.functions.AvroCodec.fromAvroFramed(c, rs.schemaJson, rs.id)
        } else graft.functions.AvroCodec.fromAvro(c, registry.latestSchema(subj))
      val decodedKey = keySubject.map(subj =>
        decodeWith(col(keyCol), subj).as(keyCol)).toSeq
      val decodedValue =
        decodeWith(col(valueCol), str(args, "value_schema").get).as(valueCol)
      val decoded = df.select(passthrough.map(col) ++ decodedKey :+ decodedValue: _*)
      val keyOut =
        if (keySubject.isEmpty) Seq.empty
        else if (bool(args, "expand_key")) Seq(s"$keyCol.*") else Seq(keyCol)
      val valueOut =
        if (bool(args, "expand_value", default = true)) s"$valueCol.*" else valueCol
      decoded.selectExpr(passthrough ++ keyOut :+ valueOut: _*)
    }
    case "with_regex_value" => df => {
      val inputCol = str(args, "input_col").get
      // the reference calls the group index `idx`
      // (`transformers/regex_transformers.py:17-23`); group_index kept as
      // an accepted alias
      val idx = num(args, "idx").orElse(num(args, "group_index"))
        .map(_.toInt).getOrElse(1)
      val out = df.withColumn(str(args, "output_col").getOrElse("extracted_value"),
        regexp_extract(col(inputCol), str(args, "regex").get, idx))
      if (bool(args, "drop_input_col")) out.drop(inputCol) else out
    }
    case "hash_masker" => df => {
      val approach = str(args, "approach").getOrElse("SHA")
      strSeq(args, "cols").foldLeft(df) { (d, c) =>
        val suffix = str(args, "suffix").getOrElse("_hash")
        val masked = approach.toUpperCase match {
          // raw Murmur3 int, as upstream (`transformers/data_maskers.py:44`
          // uses Spark's `hash` unchanged — its golden pins the int values)
          case "MURMUR3" => hash(col(c))
          case _ => sha2(col(c).cast("string"), num(args, "num_bits").map(_.toInt).getOrElse(256))
        }
        d.withColumn(c + suffix, masked)
      }
    }
    case "column_dropper" => df => df.drop(strSeq(args, "cols"): _*)
    case "replace_nulls" => df => {
      // reference field spellings and defaults
      // (`transformers/null_handlers.py:16-22`): default_num_value -999,
      // default_string_value "UNKNOWN", subset_cols. The earlier local
      // spellings stay accepted.
      val subset = strSeq(args, "subset_cols") match {
        case s if s.nonEmpty => s
        case _ => strSeq(args, "subset")
      }
      val numeric = num(args, "default_num_value")
        .orElse(num(args, "replace_on_nums_value")).getOrElse(-999.0)
      val string = str(args, "default_string_value")
        .orElse(str(args, "replace_on_strings_value")).getOrElse("UNKNOWN")
      val replaceNums = bool(args, "replace_on_nums", default = true)
      val replaceStrs = bool(args, "replace_on_strings", default = true)
      val d1 = if (replaceNums) {
        if (subset.nonEmpty) df.na.fill(numeric, subset) else df.na.fill(numeric)
      } else df
      if (replaceStrs) {
        if (subset.nonEmpty) d1.na.fill(string, subset) else d1.na.fill(string)
      } else d1
    }

    // ---- dates (§2.3) ---------------------------------------------------
    case "add_current_date" => df =>
      // deliberately a driver constant, as in the reference
      // (`transformers/date_transformers.py:17-35`)
      df.withColumn(str(args, "output_col").getOrElse("lhe_load_date"),
        lit(java.sql.Timestamp.from(java.time.Instant.now())))
    case "convert_to_date" => df =>
      strSeq(args, "cols").foldLeft(df)((d, c) =>
        d.withColumn(c, to_date(col(c), str(args, "source_format").getOrElse("yyyy-MM-dd"))))
    case "convert_to_timestamp" => df =>
      strSeq(args, "cols").foldLeft(df)((d, c) =>
        d.withColumn(c, to_timestamp(col(c),
          str(args, "source_format").getOrElse("yyyy-MM-dd HH:mm:ss"))))
    case "format_date" => df =>
      strSeq(args, "cols").foldLeft(df)((d, c) =>
        d.withColumn(c, date_format(col(c), str(args, "target_format").getOrElse("yyyy-MM-dd"))))
    case "get_date_hierarchy" => df =>
      strSeq(args, "cols").foldLeft(df) { (d, c) =>
        d.withColumn(s"${c}_day", dayofmonth(col(c)))
          .withColumn(s"${c}_week", weekofyear(col(c)))
          .withColumn(s"${c}_month", month(col(c)))
          .withColumn(s"${c}_quarter", quarter(col(c)))
          .withColumn(s"${c}_year", year(col(c)))
      }

    // ---- custom / sql ---------------------------------------------------
    case "temp_view" => df => {
      df.createOrReplaceTempView(str(args, "name").get); df
    }
    case "custom_transformation" =>
      // the reference's ACON key is `custom_transformer` (a function
      // object there; a registered-function name here) — accepted next to
      // this build's original `function_name`
      ctx.customFns(str(args, "function_name")
        .orElse(str(args, "custom_transformer")).getOrElse(
          sys.error("custom_transformation needs function_name")))
    case "sql_transformation" => _ => ctx.spark.sql(str(args, "sql").get)

    // ---- joins (§2.4) ---------------------------------------------------
    case "join" => df => {
      val rightId = str(args, "join_with").get
      val leftAlias = str(args, "left_df_alias").getOrElse("a")
      val rightAlias = str(args, "right_df_alias").getOrElse("b")
      var left = df.as(leftAlias)
      var right = ctx.data(rightId).as(rightAlias)
      anyMap(args, "left_watermark").foreach { case (c, d) =>
        left = left.withWatermark(c, String.valueOf(d)) }
      anyMap(args, "right_watermark").foreach { case (c, d) =>
        right = right.withWatermark(c, String.valueOf(d)) }
      // reference shape (`transformers/joiners.py:47,64-76`):
      // watermarker keyed by df alias, each {col, watermarking_time}
      def aliasWm(side: DataFrame, alias: String): DataFrame =
        anyMap(args, "watermarker").get(alias) match {
          case Some(m: collection.Map[_, _]) =>
            val mm = m.map { case (k, v) => String.valueOf(k) -> v }
            side.withWatermark(String.valueOf(mm("col")),
              String.valueOf(mm("watermarking_time")))
          case _ => side
        }
      left = aliasWm(left, leftAlias)
      right = aliasWm(right, rightAlias)
      // reference default is broadcast_join = TRUE (`joiners.py:26`); a
      // streaming right side cannot be broadcast, so the hint is only
      // applied to static sides
      val rightSide =
        if (bool(args, "broadcast_join", default = true) && !right.isStreaming)
          broadcast(right)
        else right
      // the reference renders `{join_type.upper()} JOIN` into SQL text
      // (`transformers/joiners.py:86`), so spaced spellings like
      // "left outer" are valid config — normalize for the DataFrame API
      val joined = left.join(rightSide,
        expr(str(args, "join_condition").get),
        str(args, "join_type").getOrElse("inner").trim.replace(' ', '_'))
      strSeq(args, "select_cols") match {
        case Seq() => joined
        case cols => joined.selectExpr(cols: _*)
      }
    }

    // ---- aggregations / condensation (§2.5) ----------------------------
    case "get_max_value" => df =>
      df.agg(max(col(str(args, "input_col").get)).as(str(args, "output_col").getOrElse("latest")))
    case "condense_record_mode_cdc" => df =>
      Condense.condenseRecordModeCdc(df,
        businessKey = strSeq(args, "business_key"),
        rankingDesc = strSeq(args, "ranking_key_desc"),
        rankingAsc = strSeq(args, "ranking_key_asc"),
        recordModeCol = str(args, "record_mode_col"),
        validRecordModes = strSeq(args, "valid_record_modes"))
    case "group_and_rank" => df =>
      Condense.groupAndRank(df,
        strSeq(args, "group_key").map(col),
        strSeq(args, "ranking_key").map(c => col(c).desc),
        num(args, "ranks_to_keep").map(_.toInt).getOrElse(1)).drop("lhe_rank")

    // ---- set ops / unions (§2.6) ---------------------------------------
    case "union" => df => {
      val others = strSeq(args, "union_with").map(ctx.data)
      val all = others.foldLeft(df)(_ union _)
      if (bool(args, "deduplication", default = true)) all.distinct() else all
    }
    case "union_by_name" => df => {
      // reference default is TRUE (`transformers/unions.py:46`) — the
      // diff-schema fixture relies on it with no explicit arg
      val allowMissing = bool(args, "allow_missing_columns", default = true)
      val others = strSeq(args, "union_with").map(ctx.data)
      val all = others.foldLeft(df)((a, b) => a.unionByName(b, allowMissing))
      if (bool(args, "deduplication", default = true)) all.distinct() else all
    }
    case "except" => df => {
      val other = ctx.data(str(args, "except_with").get)
      if (bool(args, "all")) df.exceptAll(other) else df.except(other)
    }
    case "intersect" => df => {
      val other = ctx.data(str(args, "intersect_with").get)
      if (bool(args, "all")) df.intersectAll(other) else df.intersect(other)
    }

    // ---- repartitioning / caching (§2.6) -------------------------------
    case "repartition" => df => {
      val cols = strSeq(args, "cols").map(col)
      num(args, "num_partitions").map(_.toInt) match {
        case Some(n) if cols.nonEmpty => df.repartition(n, cols: _*)
        case Some(n) => df.repartition(n)
        case None => df.repartition(cols: _*)
      }
    }
    case "coalesce" => df => df.coalesce(num(args, "num_partitions").get.toInt)
    // Optimizer fence (engine extension, no reference counterpart): pins
    // the plan below it so expensive derived columns (tokenize/shingle
    // chains, HOFs) are computed ONCE instead of being inlined by
    // CollapseProject/PushDownPredicates into every consumer — the
    // declarative-SQL equivalent of graft.util.PlanBarrier.fence.
    case "plan_barrier" => df => graft.util.PlanBarrier.fence(df)
    case "cache" => df => df.cache()
    case "persist" => df =>
      df.persist(graft.exec.StorageLevels.parse(str(args, "storage_level").getOrElse("MEMORY_AND_DISK")))
    case "unpersist" => df => df.unpersist(bool(args, "blocking"))

    // ---- curation stages as declarative pipeline steps (engine
    // extension: the reference reaches custom logic only through
    // `custom_transformation` lambdas; these make the training-data
    // operators config-addressable, so an ACON file alone can express
    // dedup -> quality-filter -> sample). The corpus-statistics stages
    // are in StreamingUnsupported and re-plan into foreachBatch. ------
    case "minhash_dedup" => df => {
      val idc = str(args, "id_col").get
      val pairs = graft.functions.DedupFunctions.minhashNearDuplicates(
        df, idc, str(args, "text_col").get,
        threshold = num(args, "threshold").getOrElse(0.8))
      // Cluster-safe survivor rule: one canonical member per duplicate
      // CLIQUE (pairwise keep-lowest would over-drop chained pairs).
      val dropped = graft.functions.DedupFunctions
        .duplicateClusters(pairs.select("id_a", "id_b"))
        .where(col("id") =!= col("canonical_id"))
        .select(col("id").cast(df.schema(idc).dataType).as(idc))
      df.join(dropped, Seq(idc), "left_anti")
    }
    case "perplexity_filter" => df =>
      graft.functions.TextFunctions.perplexityFilter(df,
        str(args, "id_col").get, str(args, "text_col").get,
        num(args, "max_nll").get)
    case "importance_filter" => df => {
      val idc = str(args, "id_col").get
      val keep = graft.functions.TextFunctions.importanceWeights(df, idc,
          str(args, "text_col").get, expr(str(args, "target_exp").get),
          num(args, "buckets").map(_.toInt).getOrElse(256))
        .where(col("log_weight") >= num(args, "min_log_weight").get)
        .select(col("id").cast(df.schema(idc).dataType).as(idc))
      df.join(keep, Seq(idc), "left_semi")
    }
    case "hash_sample" => df =>
      graft.operators.TrainingData.hashSample(df,
        col(str(args, "key_col").get), num(args, "fraction").get,
        num(args, "salt").map(_.toLong).getOrElse(0L))

    // ---- tokenizer-to-shards export stages: an ACON file alone can run
    // the full training-data export — BPE train+encode, pack planning,
    // sharded export with manifest ---------------------------------------
    case "bpe_tokenize" => df => {
      val idc = str(args, "id_col").get
      val merges = graft.functions.Bpe.train(df, str(args, "text_col").get,
        num(args, "num_merges").get.toInt,
        num(args, "max_word_len").map(_.toInt).getOrElse(64))
      graft.functions.Bpe.encode(df, idc, str(args, "text_col").get, merges)
        .withColumnRenamed("id", idc)
    }
    case "sequence_pack" => df =>
      graft.operators.TrainingData.packSequences(df,
        str(args, "id_col").get,
        str(args, "text_col").getOrElse("subwords"),
        num(args, "token_budget").get.toInt,
        num(args, "n_shards").get.toInt)
    case "shard_export" => df =>
      // writes the hive-partitioned shards under `location` as a side
      // effect and RETURNS the manifest — the natural ACON shape: the
      // output spec persists the manifest next to the shards
      graft.operators.TrainingData.writeShards(df,
        str(args, "id_col").get, str(args, "location").get,
        num(args, "rows_per_shard").get.toLong,
        num(args, "sort_partitions").map(_.toInt).getOrElse(0))

    // ---- streaming (§2.8) ----------------------------------------------
    case "with_watermark" => df =>
      // reference spellings (`transformers/watermarker.py:16`):
      // watermarker_column / watermarker_time; engine-local short names
      // kept as aliases
      df.withWatermark(
        str(args, "watermarker_column").orElse(str(args, "watermark_col")).get,
        str(args, "watermarker_time").orElse(str(args, "watermark_delay"))
          .getOrElse("10 minutes"))

    case other =>
      throw new IllegalArgumentException(s"unknown transformer: $other")
  }

  /** Ordered key->value args map (JSON object order is preserved by the
    * parser's LinkedHashMap). */
  private def strMapOrdered(m: Map[String, Any], k: String): Seq[(String, String)] =
    m.get(k).collect { case mm: collection.Map[_, _] =>
      mm.toSeq.map { case (a, b) => a.toString -> String.valueOf(b) }
    }.getOrElse(Seq.empty)

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).map(String.valueOf(_)).filter(_ != "null")
  private def bool(m: Map[String, Any], k: String, default: Boolean = false): Boolean =
    m.get(k).collect { case b: Boolean => b }.getOrElse(default)
  private def num(m: Map[String, Any], k: String): Option[Double] =
    m.get(k).collect { case n: Number => n.doubleValue() }
  private def strMap(m: Map[String, Any], k: String): Map[String, String] =
    strMapOrdered(m, k).toMap
  private def anyMap(m: Map[String, Any], k: String): Map[String, Any] =
    m.get(k).collect { case mm: collection.Map[_, _] =>
      mm.map { case (a, b) => a.toString -> b }.toMap
    }.getOrElse(Map.empty)
  private def strSeq(m: Map[String, Any], k: String): Seq[String] =
    m.get(k).collect {
      case s: Seq[_] => s.map(String.valueOf(_))
      case s: String => Seq(s)
    }.getOrElse(Seq.empty)
}
