package graft

import org.scalatest.funsuite.AnyFunSuite

/** Settings — the layered config surface (file + GRAFT_ env overlay,
  * env wins), shaped like the reference's Settings/MinioConfig/ApiConfig
  * triple and parsed from the same YAML subset its config file uses. */
class SettingsSpec extends AnyFunSuite {

  private val fixture =
    """# engine worklist
      |cities:
      |  - "11001"
      |  - "11002"   # trailing comment
      |  - 11003
      |
      |minio:
      |  endpoint: "http://store.local:9000"
      |  access_key: "ak-test"
      |  secret_key: 'sk-test'
      |  bucket: "graft-spool"
      |  region: "eu-central-1"
      |api:
      |  headers:
      |    x-client-id: "c-123"
      |    x-api-key: "k#456"
      |    accept-language: en
      |""".stripMargin

  private def write(text: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_settings", ".yaml")
    java.nio.file.Files.write(f, text.getBytes("UTF-8"))
    f.toString
  }

  test("file-only load: lists, nesting, quotes, comments, dashed header keys") {
    val s = Settings.load(write(fixture), env = Map.empty)
    assert(s.cities === Seq("11001", "11002", "11003"))
    assert(s.minio === MinioSettings(
      "http://store.local:9000", "ak-test", "sk-test", "graft-spool", "eu-central-1"))
    // '#' inside quotes is NOT a comment; dashed keys survive
    assert(s.apiHeaders === Map(
      "x-client-id" -> "c-123", "x-api-key" -> "k#456", "accept-language" -> "en"))
  }

  test("GRAFT_ environment overlay wins per key; untouched keys keep file values") {
    val s = Settings.load(write(fixture), env = Map(
      "GRAFT_MINIO_BUCKET" -> "prod-spool",
      "GRAFT_MINIO_ENDPOINT" -> "https://s3.example.test",
      "GRAFT_CITIES" -> "22001, 22002",
      "UNRELATED" -> "ignored"))
    assert(s.minio.bucket === "prod-spool")
    assert(s.minio.endpoint === "https://s3.example.test")
    assert(s.minio.region === "eu-central-1") // file value survives
    assert(s.cities === Seq("22001", "22002")) // list overlays as CSV
    assert(s.apiHeaders("x-client-id") === "c-123")
  }

  test("the overlay overrides existing keys only — it cannot invent structure") {
    val flat = Settings.overlay(
      Map("minio.bucket" -> Left("b")),
      Map("GRAFT_MINIO_TYPO" -> "x", "GRAFT_MINIO_BUCKET" -> "c"))
    assert(flat === Map("minio.bucket" -> Left("c")))
  }

  test("missing file and missing required keys fail loudly") {
    intercept[java.nio.file.NoSuchFileException] {
      Settings.load("/nonexistent/graft.yaml", env = Map.empty)
    }
    val e = intercept[RuntimeException] {
      Settings.load(write("cities:\n  - \"1\"\n"), env = Map.empty)
    }
    assert(e.getMessage.contains("minio.endpoint"))
  }

  test("outside-the-subset syntax is a loud error, never a silent misparse") {
    intercept[IllegalArgumentException] {
      Settings.parse("minio:\n\tendpoint: x\n") // tab indentation
    }
    intercept[IllegalArgumentException] {
      Settings.parse("cities: [a, b]\n") // flow sequence
    }
    intercept[IllegalArgumentException] {
      Settings.parse("key value no colon\n")
    }
  }

  test("duplicate keys are a loud error, not YAML's silent last-wins") {
    val e = intercept[IllegalArgumentException] {
      Settings.parse("a: 1\nb: 2\na: 3\n")
    }
    assert(e.getMessage.contains("duplicate key 'a'"))
    val e2 = intercept[IllegalArgumentException] { // nested form
      Settings.parse("m:\n  x: 1\n  x: 2\n")
    }
    assert(e2.getMessage.contains("duplicate key 'm.x'"))
    val e3 = intercept[IllegalArgumentException] { // reopened list block
      Settings.parse("cities:\n  - a\ncities:\n  - b\n")
    }
    assert(e3.getMessage.contains("duplicate key 'cities'"))
    // same leaf name under different scopes is NOT a duplicate
    assert(Settings.parse("m:\n  x: 1\nn:\n  x: 2\n") ===
      Map("m.x" -> Left("1"), "n.x" -> Left("2")))
  }

  test("sibling scopes close correctly: a dedent pops the nested map") {
    val flat = Settings.parse(
      "a:\n  b: 1\nc:\n  d: 2\n  e:\n    f: 3\n  g: 4\n")
    assert(flat === Map(
      "a.b" -> Left("1"), "c.d" -> Left("2"),
      "c.e.f" -> Left("3"), "c.g" -> Left("4")))
  }
}
