package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.hl7.Er7Parser

/** Property-based parser checks (SURVEY.md §5.2.4): render random ER7
  * messages and verify structural invariants of the parse. Drives ScalaCheck
  * generators directly (deterministic seeds) — the scalatestplus bridge
  * isn't on the classpath. */
class Er7PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val token: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  private val field: Gen[String] = for {
    reps <- Gen.chooseNum(1, 3)
    rep <- Gen.listOfN(reps, for {
      comps <- Gen.chooseNum(1, 4)
      cs <- Gen.listOfN(comps, token)
    } yield cs.mkString("^"))
  } yield rep.mkString("~")

  private val segment: Gen[String] = for {
    id <- Gen.oneOf("PID", "OBX", "NK1", "PV1", "DG1", "ZZ1")
    nFields <- Gen.chooseNum(1, 8)
    fs <- Gen.listOfN(nFields, field)
  } yield (id +: fs).mkString("|")

  private val message: Gen[String] = for {
    version <- Gen.oneOf("2.1", "2.3", "2.5", "2.7")
    nSegs <- Gen.chooseNum(0, 6)
    segs <- Gen.listOfN(nSegs, segment)
  } yield (s"MSH|^~\\&|App|Fac|RApp|RFac|20240101||ADT^A01|CTRL|P|$version" +: segs)
    .mkString("\r")

  test("every generated message parses; segment ids/count/order survive") {
    forAll(message) { m =>
      val p = Er7Parser.parse(m)
      assert(p.isRight, s"parse failed for: $m -> $p")
      val parsed = p.toOption.get
      val expectedIds = m.split('\r').map(_.takeWhile(_ != '|')).toSeq
      assert(parsed.segments.map(_.segment_id) == expectedIds)
      assert(parsed.segments.map(_.seq) == (1 to expectedIds.size))
    }
  }

  test("whole-field values reassemble the raw field text (repetition split is lossless)") {
    forAll(segment) { seg =>
      val m = s"MSH|^~\\&|A|B|C|D|20240101||ADT^A01|X|P|2.5\r$seg"
      val parsed = Er7Parser.parse(m).toOption.get.segments(1)
      val segId = seg.takeWhile(_ != '|')
      val rawFields = seg.split('|').drop(1)
      rawFields.zipWithIndex.foreach { case (raw, i) =>
        if (raw.nonEmpty) {
          val reps = parsed.fields(s"$segId-${i + 1}")
          assert(reps.mkString("~") == raw,
            s"field $segId-${i + 1}: ${reps.mkString("~")} != $raw")
        } else {
          assert(!parsed.fields.contains(s"$segId-${i + 1}"))
        }
      }
    }
  }

  test("unescape is identity on escape-free strings") {
    forAll(Gen.asciiPrintableStr.map(_.filterNot(c => c == '\\'))) { s =>
      assert(Er7Parser.unescape(s, '\\') == s)
    }
  }

  test("dedup idempotence: parsing twice gives identical structures") {
    forAll(message) { m =>
      assert(Er7Parser.parse(m) == Er7Parser.parse(m))
    }
  }
}
