package graft.io

import graft.SparkSpec
import graft.spec.InputSpec
import java.util.concurrent.ConcurrentLinkedQueue

class IoSpec extends SparkSpec {

  import spark.implicits._

  test("sap extraction pure contracts: identifiers, data_target, filters") {
    // identifier handling (dialect notes in SapExtraction's scaladoc)
    assert(SapExtraction.quoteIdent("date") == "\"DATE\"")
    assert(SapExtraction.quoteIdent("\"/bic/article\"") == "\"/bic/article\"")
    assert(SapExtraction.aliased("(SELECT 1)") == "(SELECT 1) AS graft_subq")
    assert(SapExtraction.aliased("SAPHANADB.T1") == "SAPHANADB.T1")
    // data_target derivation (`sap_b4_extraction_utils.py:107-127`):
    // strip quotes/backslashes, last '/' segment minus first+last char
    assert(SapB4Extraction.dataTarget(Map("dbtable" -> "/BIC/abtable12")) ==
      "btable1")
    assert(SapB4Extraction.dataTarget(Map(
      "dbtable" -> "x", "data_target" -> "dummy_table")) == "dummy_table")
    // request-status filters per ADSO type
    // (`sap_b4_extraction_utils.py:253-281`)
    val aq = SapB4Extraction.requestStatusFilter("AQ", "dummy_table")
    assert(aq.contains("STORAGE = 'AQ'") &&
      aq.contains("REQUEST_STATUS IN ('GG', 'GR')") &&
      aq.contains("UPPER(DATATARGET) = UPPER('dummy_table')"))
    val cl = SapB4Extraction.requestStatusFilter("CL", "dummy_table")
    assert(cl.contains("STORAGE = 'AT'") &&
      cl.contains("REQUEST_STATUS IN ('GG')"))
    intercept[UnsupportedOperationException] {
      SapB4Extraction.requestStatusFilter("XX", "t")
    }
    // odsobject derivation + changelog fallback
    // (`sap_bw_extraction_utils.py:101-195`)
    assert(SapBwExtraction.odsobject(Map("dbtable" -> "db.sales")) == "sales")
    assert(SapBwExtraction.odsobject(Map("dbtable" -> "sales")) == "sales")
    assert(SapBwExtraction.deriveChangelogTable(spark, "url", "u", "p", "d",
      odsobject = None, changelogTable = None, extractionType = "delta",
      dbtable = "dummy_table") == "dummy_table_cl")
    assert(SapBwExtraction.deriveChangelogTable(spark, "url", "u", "p", "d",
      odsobject = Some("ods"), changelogTable = Some("given"),
      extractionType = "delta") == "given")
  }

  test("rest api writer streams payloads through partitions") {
    val sent = IoSpec.sentQueue
    sent.clear()
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v").repartition(2)
    val failures = RestApiWriter.writeColumns(df, Seq("id", "v"), IoSpec.recordingSender)
    assert(failures == 1) // id=2 payload rejected by the fake
    val payloads = sent.toArray.map(_.toString).toSet
    assert(payloads == Set("""{"id":1,"v":"a"}""", """{"id":2,"v":"b"}""", """{"id":3,"v":"c"}"""))
  }

  test("rest_api output spec routes through the writer factory, batch and streaming") {
    // Reference `test_writers.py` write_batch_rest_api /
    // write_streaming_rest_api: data_format rest_api in an OutputSpec,
    // payload column contract, success-status gate.
    val sent = IoSpec.sentQueue
    sent.clear()
    val prevFactory = RestApiWriter.senderFactory
    try {
      RestApiWriter.senderFactory = (_, _) => IoSpec.recordingSender
      val df = Seq((1, "a"), (3, "c")).toDF("id", "v")
        .selectExpr("to_json(struct(id, v)) AS payload")
      Writers.write(spark, graft.spec.OutputSpec(
        specId = "api", inputId = "in", writeType = "append",
        dataFormat = Some("rest_api"),
        options = Map("rest_api_url" -> "http://fake/api")), df)
      assert(sent.toArray.map(_.toString).toSet ==
        Set("""{"id":1,"v":"a"}""", """{"id":3,"v":"c"}"""))

      // A rejected payload (the fake 500s id=2) fails the batch loudly.
      val bad = Seq((2, "b")).toDF("id", "v")
        .selectExpr("to_json(struct(id, v)) AS payload")
      intercept[RuntimeException] {
        Writers.write(spark, graft.spec.OutputSpec(
          specId = "api", inputId = "in", writeType = "append",
          dataFormat = Some("rest_api"),
          options = Map("rest_api_url" -> "http://fake/api")), bad)
      }
      // Missing the payload column is the reference's explicit error.
      intercept[IllegalArgumentException] {
        Writers.write(spark, graft.spec.OutputSpec(
          specId = "api", inputId = "in", writeType = "append",
          dataFormat = Some("rest_api"),
          options = Map("rest_api_url" -> "http://fake/api")),
          Seq((1, "a")).toDF("id", "v"))
      }

      // Streaming: the sink re-plans into foreachBatch.
      sent.clear()
      val srcDir = tmpDir("rest-stream-in")
      Seq((7, "z")).toDF("id", "v").write.mode("overwrite").json(srcDir)
      val stream = spark.readStream.schema("id INT, v STRING").json(srcDir)
        .selectExpr("to_json(struct(id, v)) AS payload")
      Writers.write(spark, graft.spec.OutputSpec(
        specId = "api", inputId = "in", writeType = "append",
        dataFormat = Some("rest_api"),
        streamingTrigger = Some("availableNow"),
        options = Map("rest_api_url" -> "http://fake/api",
          "checkpointLocation" -> tmpDir("rest-stream-ck"))), stream)
        .foreach(_.awaitTermination())
      assert(sent.toArray.map(_.toString).toSeq == Seq("""{"id":7,"v":"z"}"""))
    } finally RestApiWriter.senderFactory = prevFactory
  }

  test("avro container files round-trip without the spark-avro DataSource") {
    assert(!AvroFiles.dataSourceAvailable) // this build has no spark-avro
    val loc = tmpDir("avro-files") + "/data"
    val df = Seq(
      (1L, "a", Seq(1.5f, 2.5f), Map("k" -> 1), Array[Byte](1, 2)),
      (2L, null, Seq.empty[Float], Map.empty[String, Int], Array.empty[Byte]))
      .toDF("id", "name", "vec", "m", "raw").repartition(2)

    // ACON path: output spec + input spec, data_format avro.
    Writers.write(spark, graft.spec.OutputSpec(
      specId = "o", inputId = "i", writeType = "overwrite",
      dataFormat = Some("avro"), location = Some(loc)), df)
    assert(new java.io.File(loc).listFiles().count(_.getName.endsWith(".avro")) == 2)
    val back = Readers.read(spark, InputSpec(
      specId = "i", dataFormat = Some("avro"), location = Some(loc)))
    assert(back.schema.fieldNames.toSeq == Seq("id", "name", "vec", "m", "raw"))
    val rows = back.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "a")
    assert(rows(0).getSeq[Float](2) == Seq(1.5f, 2.5f))
    assert(rows(0).getMap[String, Int](3) == Map("k" -> 1))
    assert(rows(0).getAs[Array[Byte]](4).toSeq == Seq[Byte](1, 2))
    assert(rows(1).isNullAt(1) == false || rows(1).getString(1) == null)

    // append adds files; error mode raises; ignore is a no-op.
    Writers.write(spark, graft.spec.OutputSpec(
      specId = "o", inputId = "i", writeType = "append",
      dataFormat = Some("avro"), location = Some(loc)), df.limit(1))
    assert(Readers.read(spark, InputSpec(
      specId = "i", dataFormat = Some("avro"), location = Some(loc))).count() == 3)
    intercept[RuntimeException] {
      Writers.write(spark, graft.spec.OutputSpec(
        specId = "o", inputId = "i", writeType = "error",
        dataFormat = Some("avro"), location = Some(loc)), df)
    }
    Writers.write(spark, graft.spec.OutputSpec(
      specId = "o", inputId = "i", writeType = "ignore",
      dataFormat = Some("avro"), location = Some(loc)), df)
  }

  test("streaming avro output re-plans into the container-file writer") {
    val srcDir = tmpDir("avro-stream-in")
    Seq((5, "q")).toDF("id", "v").write.mode("overwrite").json(srcDir)
    val out = tmpDir("avro-stream-out") + "/d"
    val stream = spark.readStream.schema("id INT, v STRING").json(srcDir)
    Writers.write(spark, graft.spec.OutputSpec(
      specId = "o", inputId = "i", writeType = "append",
      dataFormat = Some("avro"), location = Some(out),
      streamingTrigger = Some("availableNow"),
      options = Map("checkpointLocation" -> tmpDir("avro-stream-ck"))), stream)
      .foreach(_.awaitTermination())
    val back = Readers.read(spark, InputSpec(
      specId = "i", dataFormat = Some("avro"), location = Some(out)))
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((5, "q")))
  }

  test("noop output evaluates the plan and writes nothing") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Writers.write(spark, graft.spec.OutputSpec(
      specId = "drain", inputId = "in", writeType = "append",
      dataFormat = Some("noop")), df) // no location needed, no error
  }

  test("schema resolution: dict-form schema, schema_path file, table precedence") {
    // Reference schema_utils.py:76-99: enforce_schema_from_table >
    // schema_path > schema; and the reference's inline `schema` is a
    // StructType DICT, which must survive the acon JSON round trip.
    val dir = tmpDir("schres")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/d.csv"), "1|x\n2|y\n")

    val dictAcon =
      s"""{"input_specs": [{
         |  "spec_id": "src", "read_type": "batch", "data_format": "csv",
         |  "location": "$dir", "options": {"delimiter": "|"},
         |  "schema": {"type": "struct", "fields": [
         |    {"name": "id", "type": "long", "nullable": true, "metadata": {}},
         |    {"name": "v", "type": "string", "nullable": true, "metadata": {}}]}
         |}], "output_specs": [{"spec_id": "o", "input_id": "src",
         |  "data_format": "dataframe"}]}""".stripMargin
    val spec = graft.spec.Specs.parseAcon(dictAcon).inputSpecs.head
    val viaDict = Readers.read(spark, spec)
    assert(viaDict.schema.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("id", "long"), ("v", "string")))

    // schema_path: DDL text in a file, overrides the inline schema.
    val schemaFile = s"$dir/schema.ddl"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(schemaFile), "key STRING, val STRING")
    val viaPath = Readers.read(spark, spec.copy(schemaPath = Some(schemaFile)))
    assert(viaPath.schema.fieldNames.toSeq == Seq("key", "val"))

    // enforce_schema_from_table wins over both.
    spark.sql("DROP TABLE IF EXISTS schres_shape")
    spark.sql("CREATE TABLE schres_shape (a INT, b STRING) USING parquet")
    try {
      val viaTable = Readers.read(spark, spec.copy(
        schemaPath = Some(schemaFile),
        enforceSchemaFromTable = Some("schres_shape")))
      assert(viaTable.schema.fieldNames.toSeq == Seq("a", "b"))
    } finally spark.sql("DROP TABLE schres_shape")
  }

  test("reader factory reads csv with schema and filepath projection") {
    val dir = tmpDir("reader")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/f.csv"), "id|v\n1|x\n2|y\n")
    val df = Readers.read(spark, InputSpec(
      specId = "in", dataFormat = Some("csv"), location = Some(dir),
      schema = Some("id INT, v STRING"),
      options = Map("header" -> "true", "delimiter" -> "|"),
      withFilepath = true))
    assert(df.count() == 2)
    assert(df.columns.contains("lhe_extraction_filepath"))
    assert(df.select("lhe_extraction_filepath").as[String].collect()
      .forall(_.endsWith("f.csv")))
  }

  test("query reader and temp view registration") {
    Seq((1, "x")).toDF("id", "v").createOrReplaceTempView("io_spec_src")
    val df = Readers.read(spark, InputSpec(
      specId = "q", query = Some("SELECT * FROM io_spec_src"),
      tempView = Some("io_spec_out")))
    assert(df.count() == 1)
    assert(spark.table("io_spec_out").count() == 1)
  }

  test("sftp reader parses xml and fixed-width formats (reference sftp format set)") {
    // Reference `sftp_extraction_utils.py:236-242` accepts csv/fwf/json/xml.
    val dir = tmpDir("sftp-fmt")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/feed.xml"),
      "<rows><row><id>1</id><v>x</v></row><row><id>2</id><v>y</v></row></rows>")
    val xml = SftpReader.read(spark, dir,
      Map("sftp_files_format" -> "xml", "rowTag" -> "row",
        "file_name_contains" -> ".xml"))
    assert(xml.orderBy("id").collect().map(r =>
      (r.getLong(r.fieldIndex("id")), r.getString(r.fieldIndex("v")))).toSeq ==
      Seq((1L, "x"), (2L, "y")))

    // fwf: widths 3/5/2, pandas read_fwf(widths=...) semantics, trimmed.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/fix.txt"),
      "001alpha 7\n002beta  9\n")
    val fwf = SftpReader.read(spark, dir,
      Map("sftp_files_format" -> "fwf", "fwf_widths" -> "3,6,1",
        "fwf_columns" -> "id,name,n", "file_name_contains" -> ".txt"))
    assert(fwf.orderBy("id").collect().map(r =>
      (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("001", "alpha", "7"), ("002", "beta", "9")))
    // width/name mismatch fails loudly
    intercept[IllegalArgumentException] {
      SftpReader.read(spark, dir,
        Map("sftp_files_format" -> "fwf", "fwf_widths" -> "3,6,1",
          "fwf_columns" -> "id,name", "file_name_contains" -> ".txt"))
    }
  }

  test("sftp reader stages files through the local transport") {
    val dir = tmpDir("sftp")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/sub"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.csv"), "id,v\n1,x\n2,y\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/sub/b.csv"), "id,v\n3,z\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/skip.json"), """{"id": 9}""")
    // plain read: both csv files (sub_dir opts into the reference's
    // one-level recursion), json ignored by the filter
    val df = Readers.read(spark, InputSpec(
      specId = "s", dataFormat = Some("sftp"), location = Some(dir),
      options = Map("sftp_files_format" -> "csv", "header" -> "true",
        "inferSchema" -> "true", "file_name_contains" -> ".csv",
        "sub_dir" -> "true")))
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "v"))
    // without sub_dir, only the top-level file is listed (reference
    // `_get_folder_items` semantics)
    assert(Readers.read(spark, InputSpec(
      specId = "s", dataFormat = Some("sftp"), location = Some(dir),
      options = Map("sftp_files_format" -> "csv", "header" -> "true",
        "file_name_contains" -> ".csv"))).count() == 2)
    // file_metadata adds the ORIGINAL remote path + modification time
    val meta = SftpReader.read(spark, dir,
      Map("sftp_files_format" -> "csv", "header" -> "true",
        "file_name_contains" -> ".csv", "file_metadata" -> "true",
        "sub_dir" -> "true"))
    assert(meta.count() == 3)
    val names = meta.select("filename").distinct()
      .collect().map(_.getString(0)).sorted
    assert(names.toSeq == Seq(s"$dir/a.csv", s"$dir/sub/b.csv"))
    assert(meta.schema("modification_time").dataType.typeName == "timestamp")
    // json format through the same transport
    val js = SftpReader.read(spark, dir,
      Map("sftp_files_format" -> "json", "file_name_contains" -> ".json"))
    assert(js.select("id").collect().head.getLong(0) == 9L)
    // empty selection fails loudly, like the reference
    intercept[IllegalArgumentException] {
      SftpReader.read(spark, dir,
        Map("sftp_files_format" -> "csv", "file_name_contains" -> "nope"))
    }
  }

  test("ssh sftp transport mirrors a remote tree via the batch protocol") {
    // No sshd exists in this container, so the SSH layer is a fake sftp
    // client that interprets the SAME batch-file protocol the real
    // OpenSSH client would receive ('get -R -p "src" "dst"') against a
    // local directory: everything above the wire — process spawning,
    // batch-file generation, mirror layout, remote-path mapping,
    // mtime preservation — runs for real.
    val remote = tmpDir("sftp-ssh-remote")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$remote/feed/sub"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$remote/feed/a.csv"), "id,v\n1,x\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$remote/feed/sub/b.csv"), "id,v\n2,y\n")
    val fake = java.nio.file.Paths.get(tmpDir("sftp-ssh-bin"), "fake-sftp")
    java.nio.file.Files.writeString(fake,
      """#!/bin/bash
        |# fake OpenSSH sftp: consume flags, execute 'get -R -p' batch lines
        |batch=""
        |while [[ $# -gt 0 ]]; do
        |  case "$1" in
        |    -b) batch="$2"; shift 2;;
        |    -P|-o|-i) shift 2;;
        |    *) shift;;   # target user@host
        |  esac
        |done
        |while IFS= read -r line; do
        |  if [[ "$line" == get\ -R\ -p\ * ]]; then
        |    eval "args=($line)"
        |    cp -rp "${args[3]}" "${args[4]}/"
        |  fi
        |done < "$batch"
        |""".stripMargin)
    fake.toFile.setExecutable(true)
    val t = new SftpReader.SshSftpTransport(
      "user@example.invalid", command = Seq(fake.toString))
    val listed = t.list(s"$remote/feed")
    assert(listed == Seq(s"$remote/feed/a.csv", s"$remote/feed/sub/b.csv"))
    val bytes = new String(t.open(listed.head).readAllBytes())
    assert(bytes == "id,v\n1,x\n")
    // -p preserved the remote mtime on the mirror
    assert(t.mtime(listed.head) ==
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$remote/feed/a.csv")).toMillis / 1000)
    // end-to-end through the reader via a registered transport name
    SftpReader.register("ssh-test", t)
    val df = SftpReader.read(spark, s"$remote/feed",
      Map("sftp_files_format" -> "csv", "header" -> "true",
        "inferSchema" -> "true", "transport" -> "ssh-test",
        "sub_dir" -> "true"))
    assert(df.count() == 2)
    // a path that never came from list() fails loudly
    intercept[RuntimeException] { t.open(s"$remote/feed/ghost.csv") }
    // batch-protocol-unsafe paths are refused, not silently mangled
    intercept[IllegalArgumentException] { t.list("""/feed/with"quote""") }
    // re-listing the same feed replaces the previous mirror instead of
    // accumulating one full copy per poll
    val relisted = t.list(s"$remote/feed")
    assert(relisted == listed)
    assert(new String(t.open(relisted.head).readAllBytes()) == "id,v\n1,x\n")
  }

  test("sharepoint reader: path rules, pattern, metadata, archive") {
    val root = tmpDir("sharepoint")
    def put(rel: String, content: String): Unit = {
      val p = java.nio.file.Paths.get(root, rel.split("/"): _*)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, content)
    }
    put("reports/y2024/jan.csv", "id,v\n1,a\n")
    put("reports/y2024/feb.csv", "id,v\n2,b\n")
    put("reports/y2024/notes.txt", "not a csv")
    // archive_enabled defaults TRUE (reference contract) — these
    // re-reading path-rule cases opt out explicitly
    val base = Map("transport" -> s"local:$root", "header" -> "true",
      "inferSchema" -> "true", "archive_enabled" -> "false")
    // folder + file_name -> single file
    val one = SharepointIo.read(spark, base ++ Map(
      "folder_relative_path" -> "reports/y2024", "file_name" -> "jan.csv"))
    assert(one.select("v").collect().map(_.getString(0)).toSeq == Seq("a"))
    // full path with extension, no file_name
    val full = SharepointIo.read(spark, base ++ Map(
      "folder_relative_path" -> "reports/y2024/feb.csv"))
    assert(full.select("v").collect().map(_.getString(0)).toSeq == Seq("b"))
    // folder mode with fnmatch pattern + per-file metadata
    val folder = SharepointIo.read(spark, base ++ Map(
      "folder_relative_path" -> "reports/y2024", "file_pattern" -> "*.csv",
      "file_metadata" -> "true"))
    assert(folder.count() == 2)
    assert(folder.select("filename").distinct().collect().map(_.getString(0)).sorted
      .toSeq == Seq("reports/y2024/feb.csv", "reports/y2024/jan.csv"))
    // folder + file_name where the folder path embeds a file -> the
    // reference's single-file-mode constraint
    val bad = intercept[IllegalArgumentException] {
      SharepointIo.read(spark, base ++ Map(
        "folder_relative_path" -> "reports/y2024/feb.csv", "file_name" -> "jan.csv"))
    }
    assert(bad.getMessage.contains(
      "When `folder_relative_path` points to a file, `file_name` must be None."))
    // folder mode lists ONE file type (csv by default, reference
    // `_get_csv_files_in_folder`) — mixed content is filtered, not merged
    put("mixed/a.csv", "id,v\n1,a\n")
    put("mixed/b.json", """{"id":2,"v":"b"}""" + "\n")
    assert(SharepointIo.read(spark,
      base ++ Map("folder_relative_path" -> "mixed")).count() == 1)
    // ...and file_type json selects the json side — json support opts in
    // via the reference's allowed_extensions mechanism (the default is
    // its csv/xlsx set)
    assert(SharepointIo.read(spark, base ++ Map(
      "folder_relative_path" -> "mixed", "file_type" -> "json",
      "allowed_extensions" -> ".csv,.xlsx,.json",
      "file_pattern" -> "*.json")).count() == 1)
    // archive: read moves the files into done/, and the returned frame
    // stays readable after the spool copies are deleted (lineage cut)
    val archived = SharepointIo.read(spark, base ++ Map(
      "folder_relative_path" -> "reports/y2024", "file_pattern" -> "*.csv",
      "archive_enabled" -> "true"))
    val t = new SharepointIo.LocalDriveTransport(root)
    assert(t.list("reports/y2024/done").sorted == Seq("feb.csv", "jan.csv"))
    assert(t.list("reports/y2024") == Seq("notes.txt"))
    archived.unpersist() // even a dropped cache must not break the read
    assert(archived.count() == 2)
  }

  test("graph http transport: full protocol against a local fake Graph server") {
    // No Graph tenant exists in this zero-egress environment, so the
    // HTTP layer is exercised against a JDK HttpServer implementing the
    // same documented endpoints over a local directory: OAuth
    // client-credentials token fetch + caching, bearer auth on every
    // call, item/children/content/conflict/move semantics — everything
    // except the production host name.
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val root = java.nio.file.Paths.get(tmpDir("graph-root"))
    def local(rel: String) = root.resolve(rel.split("/").mkString(java.io.File.separator))
    java.nio.file.Files.createDirectories(local("reports"))
    java.nio.file.Files.writeString(local("reports/jan.csv"), "id,v\n1,a\n")
    java.nio.file.Files.writeString(local("reports/feb.csv"), "id,v\n2,b\n")

    var tokenCalls = 0
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/token", (x: HttpExchange) => {
      tokenCalls += 1
      val body = new String(x.getRequestBody.readAllBytes())
      val ok = body.contains("grant_type=client_credentials") &&
        body.contains("client_id=cid") && body.contains("client_secret=sec")
      val resp = if (ok) """{"access_token":"test-token","expires_in":3600}"""
        else """{"error":"bad request"}"""
      x.sendResponseHeaders(if (ok) 200 else 400, resp.length)
      x.getResponseBody.write(resp.getBytes); x.close()
    })
    server.createContext("/v1.0/", (x: HttpExchange) => {
      def reply(code: Int, body: Array[Byte]): Unit = {
        x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) x.getResponseBody.write(body); x.close()
      }
      if (x.getRequestHeaders.getFirst("Authorization") != "Bearer test-token") {
        reply(401, "unauthorized".getBytes); ()
      } else {
        val raw = java.net.URLDecoder.decode(x.getRequestURI.toString, "UTF-8")
        val after = raw.substring(raw.indexOf("root:/") + 6)
        val (path, action) =
          if (after.endsWith(":/children")) (after.dropRight(10), "children")
          else if (after.contains(":/content")) (after.substring(0, after.indexOf(":/content")),
            "content" + (if (after.contains("conflictBehavior=fail")) "!fail" else ""))
          else (after, "item")
        val p = local(path)
        (x.getRequestMethod, action) match {
          case ("GET", "item") =>
            reply(if (java.nio.file.Files.exists(p)) 200 else 404, "{}".getBytes)
          case ("GET", "children") =>
            val s = java.nio.file.Files.list(p)
            val items = try {
              import scala.jdk.CollectionConverters._
              s.iterator().asScala.map { f =>
                val facet = if (java.nio.file.Files.isDirectory(f)) "folder" else "file"
                s"""{"name":"${f.getFileName}","$facet":{}}"""
              }.mkString(",")
            } finally s.close()
            reply(200, s"""{"value":[$items]}""".getBytes)
          case ("GET", "content") =>
            reply(200, java.nio.file.Files.readAllBytes(p))
          case ("PUT", a) if a.startsWith("content") =>
            if (a.endsWith("!fail") && java.nio.file.Files.exists(p)) reply(409, "{}".getBytes)
            else {
              java.nio.file.Files.createDirectories(p.getParent)
              java.nio.file.Files.write(p, x.getRequestBody.readAllBytes())
              reply(201, "{}".getBytes)
            }
          case ("PATCH", "item") =>
            val body = new String(x.getRequestBody.readAllBytes())
            val dest = body.split("root:/")(1).takeWhile(_ != '"')
            java.nio.file.Files.createDirectories(local(dest))
            java.nio.file.Files.move(p, local(dest).resolve(p.getFileName),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            reply(200, "{}".getBytes)
          case other => reply(500, s"unexpected $other".getBytes)
        }
      }
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val tokens = GraphHttp.clientCredentialsTokenProvider(
        s"$base/token", "cid", "sec")
      val t = new GraphHttp.GraphHttpTransport("s1", "d1", tokens, s"$base/v1.0")
      // raw transport surface
      assert(t.exists("reports") && !t.exists("reports/ghost.csv"))
      assert(t.list("reports") == Seq("feb.csv", "jan.csv"))
      assert(new String(t.download("reports/jan.csv").readAllBytes()) == "id,v\n1,a\n")
      // end-to-end: the SAME SharepointIo read/write/archive paths the
      // local transport runs, now over HTTP
      SharepointIo.register("graph-test", t)
      val df = SharepointIo.read(spark, Map("transport" -> "graph-test",
        "folder_relative_path" -> "reports", "file_pattern" -> "*.csv",
        "header" -> "true", "inferSchema" -> "true", "archive" -> "true"))
      assert(df.count() == 2)
      assert(t.list("reports/done") == Seq("feb.csv", "jan.csv"))
      SharepointIo.write(df.limit(1), Map("transport" -> "graph-test",
        "folder_relative_path" -> "reports", "file_name" -> "out.csv",
        "header" -> "true"))
      assert(t.list("reports") == Seq("out.csv"))
      intercept[RuntimeException] {
        t.upload("reports/out.csv", "x".getBytes, "fail")
      }
      // the token was fetched once and cached across ~15 HTTP calls
      assert(tokenCalls == 1)
    } finally server.stop(0)
  }

  test("sigv4 signer matches an independently computed reference signature") {
    // expected values computed with python hashlib/hmac implementing the
    // published SigV4 algorithm over the same fixed request — an
    // independent oracle, not a round-trip through this signer
    val payload = ("""<RestoreRequest xmlns="http://s3.amazonaws.com/doc/2006-03-01/">""" +
      "<Days>3</Days><GlacierJobParameters><Tier>Standard</Tier>" +
      "</GlacierJobParameters></RestoreRequest>").getBytes("UTF-8")
    val (auth, amzDate, payloadHash) = AwsSig.sign(
      method = "POST",
      path = "/my-bucket/deep/archive.parquet",
      query = Seq("restore" -> ""),
      headers = Map("host" -> "s3.local"),
      payload = payload,
      region = "eu-west-1", service = "s3",
      creds = AwsSig.Credentials("AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG/bPxRfiCYEXAMPLEKEY"),
      at = java.time.ZonedDateTime.of(2024, 1, 15, 12, 0, 0, 0,
        java.time.ZoneOffset.UTC))
    assert(amzDate == "20240115T120000Z")
    assert(payloadHash ==
      "0af34b26caac29ab9c7e055e60895523499c483571d141e43f88dd20182248ef")
    assert(auth == "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20240115/" +
      "eu-west-1/s3/aws4_request, SignedHeaders=host;x-amz-content-sha256;" +
      "x-amz-date, Signature=" +
      "87a495048bff12ee104fa5267b1fbe852f5ff23dcccbb48f4c482901d0356f57")
  }

  test("s3 glacier restore ops against a local fake S3 endpoint") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // object state machine the fake drives: archived -> restoring ->
    // restored; HEAD reports x-amz-restore accordingly
    val state = scala.collection.concurrent.TrieMap[String, String](
      "arch/data.parquet" -> "archived")
    val copies = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      def reply(code: Int, headers: Map[String, String] = Map.empty): Unit = {
        headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
        // HEAD responses must use -1 (no body)
        x.sendResponseHeaders(code, -1); x.close()
      }
      val key = x.getRequestURI.getPath.stripPrefix("/my-bucket/")
      if (!auth.startsWith("AWS4-HMAC-SHA256 Credential=testak/") ||
          !auth.contains("SignedHeaders=") || !auth.contains("Signature="))
        reply(403)
      else (x.getRequestMethod, Option(x.getRequestURI.getQuery)) match {
        case ("POST", Some(q)) if q.startsWith("restore") =>
          val body = new String(x.getRequestBody.readAllBytes())
          assert(body.contains("<Days>2</Days>") && body.contains("<Tier>Bulk</Tier>"))
          state.get(key) match {
            case Some("archived") => state(key) = "restoring"; reply(202)
            case Some(_) => reply(200) // already restoring/restored
            case None => reply(404)
          }
        case ("HEAD", _) =>
          state.get(key) match {
            case Some("restoring") =>
              // one poll observes in-progress, then the restore finishes
              state(key) = "restored"
              reply(200, Map("x-amz-restore" -> """ongoing-request="true""""))
            case Some("restored") => reply(200,
              Map("x-amz-restore" -> """ongoing-request="false", expiry-date="..."""))
            case Some(_) => reply(200)
            case None => reply(404)
          }
        case ("PUT", _) =>
          val src = x.getRequestHeaders.getFirst("x-amz-copy-source")
          assert(src == "/my-bucket/arch/data.parquet")
          copies += ((src, key)); reply(200)
        case other => reply(500)
      }
    })
    server.start()
    try {
      // client-level protocol: the restore state machine (archived ->
      // restoring -> restored) with Bulk, which the client accepts — the
      // Expedited-only guard on restore-and-wait is the choreography
      // layer's (S3FileOps), scenario-tested in ReferenceFileManagerSpec.
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new AwsSig.S3RestoreClient(endpoint, "eu-west-1",
        AwsSig.Credentials("testak", "testsk"))
      // request -> poll (in progress, then done) -> copy
      client.restoreToDestinationAndWait("my-bucket", "arch/data.parquet",
        "my-bucket", "hot/data.parquet", 2, "Bulk",
        pollMillis = 10, maxAttempts = 5)
      assert(copies.toSeq == Seq(("/my-bucket/arch/data.parquet", "hot/data.parquet")))
      assert(state("arch/data.parquet") == "restored")
      assert(client.restoreStatus("my-bucket", "arch/data.parquet")
        .contains(false)) // restored
      // no credentials and no env -> the dispatch runs the filesystem
      // manager, whose surface has no restore family -> clear failure,
      // never a silent no-op (reference dbfs_file_manager.py:85-101)
      intercept[UnsupportedOperationException] {
        graft.maintain.ManagerDispatch.execute(spark, Seq(Map(
          "manager" -> "file", "function" -> "request_restore",
          "bucket" -> "b", "source_object" -> "k",
          "restore_expiration" -> 1, "retrieval_tier" -> "Bulk",
          "dry_run" -> false)))
      }
    } finally server.stop(0)
  }

  test("s3 restore-wait: 409 in-progress + headerless HEAD race does not copy early") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    // Regression for the 409/200 conflation bug: another client's restore
    // is in flight (POST ?restore -> 409), and the first HEAD races the
    // service's restore registration (200 with NO x-amz-restore header).
    // The old two-state logic treated 409 like "already restored" and the
    // headerless HEAD ended the wait -> copyObject ran while the object
    // was still archived. Now 409 must keep polling until
    // ongoing-request="false".
    val headsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val copyAfterHeads = new java.util.concurrent.atomic.AtomicInteger(-1)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      def reply(code: Int, headers: Map[String, String] = Map.empty): Unit = {
        headers.foreach { case (k, v) => x.getResponseHeaders.set(k, v) }
        x.sendResponseHeaders(code, -1); x.close()
      }
      (x.getRequestMethod, Option(x.getRequestURI.getQuery)) match {
        case ("POST", Some(q)) if q.startsWith("restore") =>
          reply(409) // RestoreAlreadyInProgress
        case ("HEAD", _) =>
          headsSeen.incrementAndGet() match {
            case 1 => reply(200) // registration race: no x-amz-restore yet
            case 2 => reply(200,
              Map("x-amz-restore" -> """ongoing-request="true""""))
            case _ => reply(200,
              Map("x-amz-restore" -> """ongoing-request="false", expiry-date="..."""))
          }
        case ("PUT", _) =>
          copyAfterHeads.set(headsSeen.get()); reply(200)
        case _ => reply(500)
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new AwsSig.S3RestoreClient(endpoint, "eu-west-1",
        AwsSig.Credentials("testak", "testsk"))
      assert(client.requestRestore("b", "arch/x.parquet", 1, "Bulk") ==
        AwsSig.RestoreOutcome.InProgress)
      headsSeen.set(0)
      client.restoreToDestinationAndWait("b", "arch/x.parquet",
        "b", "hot/x.parquet", 1, "Bulk", pollMillis = 5, maxAttempts = 10)
      // the copy happened, and only after the third HEAD reported done —
      // not after the headerless first one
      assert(copyAfterHeads.get() == 3,
        s"copy fired after ${copyAfterHeads.get()} HEADs, want 3")
    } finally server.stop(0)
  }

  test("sharepoint writer: single-file upload with conflict behaviour") {
    val root = tmpDir("sharepoint-w")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "drop"))
    val df = spark.range(3).selectExpr("id", "concat('r', id) AS name")
    val opts = Map("transport" -> s"local:$root",
      "folder_relative_path" -> "drop", "file_name" -> "out.csv",
      "header" -> "true")
    SharepointIo.write(df, opts)
    val back = spark.read.option("header", "true")
      .csv(java.nio.file.Paths.get(root, "drop", "out.csv").toString)
    assert(back.count() == 3)
    // replace (default) overwrites; fail refuses
    SharepointIo.write(df, opts)
    intercept[RuntimeException] {
      SharepointIo.write(df, opts + ("conflict_behaviour" -> "fail"))
    }
    // missing endpoint -> reference error message
    val noEp = intercept[IllegalArgumentException] {
      SharepointIo.write(df, opts + ("folder_relative_path" -> "nope"))
    }
    assert(noEp.getMessage.contains("endpoint does not exist"))
    // writer factory routes format "sharepoint"
    Writers.writeBatch(spark, graft.spec.OutputSpec(
      specId = "sp", dataFormat = Some("sharepoint"), writeType = "append",
      options = opts + ("file_name" -> "routed.json")), df)
    assert(new SharepointIo.LocalDriveTransport(root)
      .exists("drop/routed.json"))
  }

  test("replaceWhere fallback: replaces only the predicate scope, rejects out-of-predicate rows") {
    import graft.spec.OutputSpec
    val loc = tmpDir("replace-where") + "/t"
    def out(opts: Map[String, String] = Map.empty) = OutputSpec(
      "rw", "in", "overwrite", Some("delta"), location = Some(loc),
      partitions = Seq("day"), options = opts)
    // seed: two partitions
    Writers.writeBatch(spark, out(),
      Seq((1, "a", 1), (2, "b", 2)).toDF("id", "v", "day"))
    // partition-scoped overwrite: only day=2 replaced, day=1 kept
    Writers.writeBatch(spark, out(Map("replaceWhere" -> "day = 2")),
      Seq((3, "c", 2)).toDF("id", "v", "day"))
    val back = spark.read.parquet(loc)
    assert(back.count() == 2)
    assert(back.where("day = 1").select("id").as[Int].collect().toSeq == Seq(1))
    assert(back.where("day = 2").select("id").as[Int].collect().toSeq == Seq(3))
    // Delta's constraint: a batch with rows OUTSIDE the predicate is
    // rejected outright (nothing lands — would otherwise accrete rows no
    // later replaceWhere could remove)
    val ex = intercept[RuntimeException] {
      Writers.writeBatch(spark, out(Map("replaceWhere" -> "day = 2")),
        Seq((4, "d", 2), (5, "e", 3)).toDF("id", "v", "day"))
    }
    assert(ex.getMessage.contains("replaceWhere"))
    assert(spark.read.parquet(loc).count() == 2) // unchanged
  }

  test("replaceWhere fallback: a NULL-predicate row is rejected as violating") {
    import graft.spec.OutputSpec
    val loc = tmpDir("replace-where-null") + "/t"
    def out(opts: Map[String, String] = Map.empty) = OutputSpec(
      "rwn", "in", "overwrite", Some("delta"), location = Some(loc),
      options = opts)
    Writers.writeBatch(spark, out(),
      Seq((1, Some("a")), (2, Some("b"))).toDF("id", "v"))
    // predicate `v = 'b'` evaluates to NULL for v IS NULL — real Delta
    // rejects the batch (a NULL row would accrete and no later
    // replaceWhere could ever remove it)
    val ex = intercept[RuntimeException] {
      Writers.writeBatch(spark, out(Map("replaceWhere" -> "v = 'b'")),
        Seq((3, Some("b")), (4, Option.empty[String])).toDF("id", "v"))
    }
    assert(ex.getMessage.contains("replaceWhere"))
    assert(spark.read.parquet(loc).count() == 2) // nothing landed
    // matching-only batch still goes through
    Writers.writeBatch(spark, out(Map("replaceWhere" -> "v = 'b'")),
      Seq((5, Some("b"))).toDF("id", "v"))
    assert(spark.read.parquet(loc).where("v = 'b'")
      .select("id").as[Int].collect().toSeq == Seq(5))
  }

  test("delta overwrite missing a table column is rejected without overwriteSchema") {
    import graft.spec.OutputSpec
    val loc = tmpDir("overwrite-missing-col") + "/t"
    def out(opts: Map[String, String] = Map.empty) = OutputSpec(
      "omc", "in", "overwrite", Some("delta"), location = Some(loc),
      options = opts)
    Writers.writeBatch(spark, out(), Seq((1, "a", 10)).toDF("id", "v", "n"))
    // source lacks `n`: real Delta requires column sets to match exactly on
    // overwrite — silently null-filling would drop n's data every run
    val ex = intercept[RuntimeException] {
      Writers.writeBatch(spark, out(), Seq((2, "b")).toDF("id", "v"))
    }
    assert(ex.getMessage.contains("Failed to merge"), ex.getMessage)
    assert(ex.getMessage.contains("n"), ex.getMessage)
    // overwriteSchema=true replaces the schema instead
    Writers.writeBatch(spark, out(Map("overwriteSchema" -> "true")),
      Seq((3, "c")).toDF("id", "v"))
    val back = spark.read.parquet(loc)
    assert(back.columns.toSeq == Seq("id", "v"))
    assert(back.select("id").as[Int].collect().toSeq == Seq(3))
  }
}

object IoSpec {
  val sentQueue = new ConcurrentLinkedQueue[String]()

  /** Recording fake transport: local[N] executors share this JVM. */
  val recordingSender: RestApiWriter.Sender = new RestApiWriter.Sender {
    override def send(payload: String): Int = {
      sentQueue.add(payload)
      if (payload.contains("\"id\":2")) 500 else 200
    }
  }
}
