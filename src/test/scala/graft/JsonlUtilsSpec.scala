package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.JsonlSink

/** Parity tests for the two utility functions kept for reference
  * completeness (S9 `utils.py:72-94` append_jsonl, S12
  * `utils.py:122-147` compute_file_hash — both dead code in the
  * reference, mirrored here so the §2 ledger is fully green-checked).
  */
class JsonlUtilsSpec extends AnyFunSuite {

  test("appendJsonl creates parent dirs, appends one line per call") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val path = dir.resolve("nested/deep/log.jsonl")
    assert(JsonlSink.appendJsonl(path, """{"a":1}"""))
    assert(JsonlSink.appendJsonl(path, """{"b":2}"""))
    val lines = Files.readAllLines(path)
    assert(lines.size == 2)
    assert(lines.get(0) == """{"a":1}""")
    assert(lines.get(1) == """{"b":2}""")
  }

  test("appendJsonl returns false instead of throwing on an unwritable path") {
    // a path whose parent is a regular FILE cannot be created
    val dir = Files.createTempDirectory("graft_jsonl")
    val blocker = dir.resolve("blocker")
    Files.writeString(blocker, "x")
    assert(!JsonlSink.appendJsonl(blocker.resolve("log.jsonl"), "{}"))
  }

  test("fileMd5 matches the known digest of a multi-chunk file") {
    val dir = Files.createTempDirectory("graft_md5")
    val path = dir.resolve("payload.bin")
    // > 4 KB so the 4096-byte chunk loop runs more than once
    val data = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    Files.write(path, data)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(data).map("%02x".format(_)).mkString
    assert(JsonlSink.fileMd5(path) == expected)
    // and the reference's stated contract: hex string, 32 lowercase chars
    assert(JsonlSink.fileMd5(path).matches("[0-9a-f]{32}"))
  }

  test("fileMd5 of the empty file is the canonical empty-input MD5") {
    val path = Files.createTempFile("graft_md5", ".bin")
    assert(JsonlSink.fileMd5(path) == "d41d8cd98f00b204e9800998ecf8427e")
  }
}
