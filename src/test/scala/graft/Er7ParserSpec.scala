package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.hl7.Er7Parser

class Er7ParserSpec extends AnyFunSuite {

  private val simple =
    "MSH|^~\\&|App|Fac|RApp|RFac|20240101||ADT^A01|MSG1|P|2.5\r" +
    "PID|1||P123^^^||Doe^John~Doe^Jon||19800101|M\r" +
    "OBX|1|NM|21612-7^AGE^LN||40|a^Year^UCUM|||||F"

  test("parses segment ids and sequence") {
    val p = Er7Parser.parse(simple).toOption.get
    assert(p.segments.map(_.segment_id) == Seq("MSH", "PID", "OBX"))
    assert(p.segments.map(_.seq) == Seq(1, 2, 3))
    assert(p.version == "2.5")
    assert(p.message_type == "ADT^A01")
  }

  test("field, component, repetition addressing") {
    val pid = Er7Parser.parse(simple).toOption.get.segments(1)
    assert(pid.fields("PID-8") == Seq("M"))
    assert(pid.fields("PID-5") == Seq("Doe^John", "Doe^Jon")) // repetitions
    assert(pid.fields("PID-5-1") == Seq("Doe", "Doe"))
    assert(pid.fields("PID-5-2") == Seq("John", "Jon"))
    assert(pid.fields("PID-3-1") == Seq("P123"))
  }

  test("MSH-1/MSH-2 are the separators themselves") {
    val msh = Er7Parser.parse(simple).toOption.get.segments.head
    assert(msh.fields("MSH-1") == Seq("|"))
    assert(msh.fields("MSH-2") == Seq("^~\\&"))
    assert(msh.fields("MSH-9") == Seq("ADT^A01"))
    assert(msh.fields("MSH-12") == Seq("2.5"))
  }

  test("nonstandard backtick escape char (lab01 corpus)") {
    val m = "MSH|^~`&|ECG|ROC|ERIS|ROC|20110621||ORU^R01|X|P|2.3\r" +
            "OBX|1|ST|X||a`F`b"
    val p = Er7Parser.parse(m).toOption.get
    assert(p.segments(1).fields("OBX-5") == Seq("a|b")) // `F` decodes via backtick
  }

  test("standard escape sequences decode") {
    assert(Er7Parser.unescape("a\\F\\b", '\\') == "a|b")
    assert(Er7Parser.unescape("a\\S\\b", '\\') == "a^b")
    assert(Er7Parser.unescape("a\\T\\b", '\\') == "a&b")
    assert(Er7Parser.unescape("a\\R\\b", '\\') == "a~b")
    assert(Er7Parser.unescape("a\\E\\b", '\\') == "a\\b")
    assert(Er7Parser.unescape("\\X41\\", '\\') == "A")
  }

  test("unrecognized escapes survive verbatim (RTF blobs, trailing backslash)") {
    assert(Er7Parser.unescape("{\\rtf1\\ansi}", '\\') == "{\\rtf1\\ansi}")
    assert(Er7Parser.unescape("trailing\\", '\\') == "trailing\\")
  }

  test("subcomponents") {
    val m = "MSH|^~\\&|A|B|C|D|20240101||ORU^R01|X|P|2.3\r" +
            "OBX|1|CE|8897-1&LEAD^X"
    val p = Er7Parser.parse(m).toOption.get
    assert(p.segments(1).fields("OBX-3-1") == Seq("8897-1&LEAD"))
    assert(p.segments(1).fields("OBX-3-1-1") == Seq("8897-1"))
    assert(p.segments(1).fields("OBX-3-1-2") == Seq("LEAD"))
  }

  test("rejects garbage like the reference (error branch)") {
    assert(Er7Parser.parse("I'm just a random number: 42").isLeft)
    assert(Er7Parser.parse("").isLeft)
    assert(Er7Parser.parse(null).isLeft)
    assert(Er7Parser.parse("MSH|^~\\&|no|version|here").isLeft)
  }

  test("whole reference corpus parses after prepare") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get("/root/reference/messages")
    val msgs = Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".txt"))
      .flatMap { f =>
        new String(Files.readAllBytes(f), "UTF-8")
          .split("(\\r?\\n)\\s*(\\r?\\n)+").toSeq
      }
      .map(_.replaceAll("\\s+$", "")).filter(_.nonEmpty)
      .map(_.replaceAll("\r\n|\n", "\r"))
      .toSeq
    assert(msgs.size == 11, s"expected 11 corpus messages, got ${msgs.size}")
    val results = msgs.map(Er7Parser.parse)
    val failures = results.collect { case Left(e) => e }
    assert(failures.isEmpty, s"corpus parse failures: $failures")
    val versions = results.collect { case Right(p) => p.version }.toSet
    assert(versions == Set("2.1", "2.3", "2.3.1", "2.5", "2.7"))
  }
}
