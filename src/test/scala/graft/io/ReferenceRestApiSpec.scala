package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** The reference's REST-API payload-construction unit tests executed
  * verbatim (`tests/unit/test_rest_api_functions.py` over
  * `io/writers/rest_api_writer.py:45-139`): the "Final payload" the
  * reference logs (a Python dict repr) must render identically. */
class ReferenceRestApiSpec extends AnyFunSuite {

  test("simple params: payload parsed as the JSON body") {
    val payload = RestApiWriter.buildFinalPayload(
      strPayload = """{"dummy_payload":"dummy value"}""",
      isFilePayload = false,
      filePayloadName = "file",
      extraJsonPayload = Seq.empty)
    assert(RestApiWriter.pyDict(payload) ==
      "{'dummy_payload': 'dummy value'}")
  }

  test("file params: raw string under the file name, extra json appended") {
    val payload = RestApiWriter.buildFinalPayload(
      strPayload = """{"dummy_payload":"dummy value"}""",
      isFilePayload = true,
      filePayloadName = "anotherFileName",
      extraJsonPayload = Seq("a" -> "b"))
    assert(RestApiWriter.pyDict(payload) ==
      "{'anotherFileName': '{\"dummy_payload\":\"dummy value\"}', 'a': 'b'}")
  }

  test("extra json payload overwrites in place and appends at the end") {
    val payload = RestApiWriter.buildFinalPayload(
      strPayload = """{"k1":"v1","k2":"v2"}""",
      isFilePayload = false,
      filePayloadName = "file",
      extraJsonPayload = Seq("k1" -> "patched", "k3" -> "v3"))
    assert(RestApiWriter.pyDict(payload) ==
      "{'k1': 'patched', 'k2': 'v2', 'k3': 'v3'}")
  }

  test("multipart rendering carries every entry as a form part") {
    val (body, ct) = RestApiWriter.renderBody(
      Vector("anotherFileName" -> """{"x":1}""", "a" -> "b"),
      isFilePayload = true, boundary = "BBB")
    assert(ct == "multipart/form-data; boundary=BBB")
    assert(body.contains("name=\"anotherFileName\""))
    assert(body.contains("""{"x":1}"""))
    assert(body.contains("name=\"a\""))
    assert(body.endsWith("--BBB--\r\n"))
  }

  test("empty JSON objects survive the round trip as {}, not []") {
    val payload = RestApiWriter.buildFinalPayload(
      """{"a":{},"b":[],"c":{"d":{}}}""", isFilePayload = false, "file",
      Seq("x" -> "y"))
    assert(RestApiWriter.pyDict(payload) ==
      "{'a': {}, 'b': [], 'c': {'d': {}}, 'x': 'y'}")
    val (body, _) = RestApiWriter.renderBody(payload, isFilePayload = false, "ig")
    assert(body == """{"a":{},"b":[],"c":{"d":{}},"x":"y"}""")
  }

  test("json rendering of a built payload round-trips") {
    val (body, ct) = RestApiWriter.renderBody(
      RestApiWriter.buildFinalPayload(
        """{"k1":"v1"}""", isFilePayload = false, "file", Seq("a" -> "b")),
      isFilePayload = false, boundary = "ignored")
    assert(ct == "application/json")
    assert(body == """{"k1":"v1","a":"b"}""")
  }
}
