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

  test("a pre-r16 entry without the rows field reads with rows=None; rows round-trip") {
    // r16 added per-file footer row counts (metadata-only dedupStats);
    // a pre-r16 manifest must parse with the empty default — a throw
    // would silently un-govern every table written before the change
    val old = """{"version":1,"ts":"ts","files":[{"name":"a","bytes":10,"minNs":1,"maxNs":2,"loaded":true}],"retired":[]}"""
    val m = org.json4s.jackson.Serialization.read[TsManifest](old)
    assert(m.files.head.rows.isEmpty)
    val m2 = TsManifest(1, "ts",
      Seq(TsFileEntry("a", 10L, Some(1L), Some(2L), loaded = true,
        rows = Some(42L))))
    val json = org.json4s.jackson.Serialization.write(m2)
    assert(org.json4s.jackson.Serialization.read[TsManifest](json) == m2)
  }
}
