package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{RetiredEntry, TsFileEntry, TsManifest}

/** The manifest schema must stay readable across versions: a pre-r12 (v1)
  * manifest JSON has no `retired` field — extraction must fill the empty
  * default, never throw (a throw would silently un-govern every table
  * written before the retention change).
  */
class ManifestCompatSpec extends AnyFunSuite {
  implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  test("a v1 manifest without the retired field reads with an empty default") {
    val v1 = """{"version":1,"ts":"ts","files":[{"name":"a","bytes":10,"minNs":1,"maxNs":2,"loaded":true}]}"""
    val m = org.json4s.jackson.Serialization.read[TsManifest](v1)
    assert(m.files.size == 1 && m.retired.isEmpty)
  }

  test("a manifest with retired entries round-trips") {
    val m = TsManifest(1, "ts",
      Seq(TsFileEntry("a", 10L, Some(1L), Some(2L), loaded = true)),
      Seq(RetiredEntry("b", 5L)))
    val json = org.json4s.jackson.Serialization.write(m)
    assert(org.json4s.jackson.Serialization.read[TsManifest](json) == m)
  }
}
