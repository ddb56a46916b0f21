package graft.config

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import ConfigStore._

/** The reference's config algebra: select-by-name, append, delete,
  * save-reload discipline, placeholder interpolation
  * (SURVEY.md §2.A S8/A5/F4/P8).
  */
class ConfigStoreSpec extends AnyFunSuite {

  private val doc = parse("""{
    "S3": {"Bucket": "osci-bucket"},
    "MskClusters": [
      {"MskClusterName": "c1", "MskClusterArn": "arn:1"},
      {"MskClusterName": "c2", "MskClusterArn": "arn:2"}
    ],
    "MskcConnectors": []
  }""").asInstanceOf[JObj]

  test("select-by-name finds the matching array element") {
    val c2 = selectByName(doc, "MskClusters", "MskClusterName", "c2")
    assert(c2.flatMap(_.get("MskClusterArn")) === Some(JString("arn:2")))
    assert(selectByName(doc, "MskClusters", "MskClusterName", "nope").isEmpty)
  }

  test("append + delete-by-name round-trip (A5 multiset semantics)") {
    val entry = JObj(Vector("MskcConnectorName" -> JString("conn1"),
      "Arn" -> JString("arn:c")))
    val appended = appendEntry(doc, "MskcConnectors", entry)
    assert(selectByName(appended, "MskcConnectors", "MskcConnectorName",
      "conn1").isDefined)
    val deleted = deleteByName(appended, "MskcConnectors",
      "MskcConnectorName", "conn1")
    assert(selectByName(deleted, "MskcConnectors", "MskcConnectorName",
      "conn1").isEmpty)
    // deleting a missing name is a no-op, not an error
    assert(deleteByName(deleted, "MskcConnectors", "MskcConnectorName",
      "conn1") === deleted)
  }

  test("save writes, reloads and returns an identical document") {
    val path = Files.createTempDirectory("cfg").resolve("osci-conf.json")
    val reloaded = save(path.toString, doc)
    assert(reloaded === doc)
    assert(load(path.toString) === doc)
  }

  test("parse/render handles escapes, numbers, booleans, nulls, nesting") {
    val tricky = """{"a":"line\nbreak \"q\" A","n":42,"f":1.5,"b":true,"z":null,"arr":[1,2,{"x":[]}]}"""
    val v = parse(tricky)
    assert(parse(render(v)) === v)
    val JObj(fields) = v: @unchecked
    assert(fields.collectFirst { case ("a", JString(s)) => s }
      .contains("line\nbreak \"q\" A"))
  }

  test("placeholder interpolation resolves ${provider:path:key}") {
    val secrets = Map(("secretsmanager", "osci/mysql", "username") -> "admin",
      ("secretsmanager", "osci/mysql", "password") -> "pw123")
    def res(p: String, a: String, k: String): Option[String] =
      secrets.get((p, a, k))
    assert(interpolate(
      "user=${secretsmanager:osci/mysql:username};pass=${secretsmanager:osci/mysql:password}",
      res) === Right("user=admin;pass=pw123"))
    assert(interpolate("plain string, no placeholders", res) ===
      Right("plain string, no placeholders"))
    val bad = interpolate("${secretsmanager:osci/mysql:missing}", res)
    assert(bad.isLeft)
    assert(bad.swap.exists(_.contains("missing")))
  }
}
