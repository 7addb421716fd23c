package graft.textkit

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the SURVEY §5(c) invariants: cleaning-chain
  * idempotence and repair-acceptance consistency, over the corpus-shaped
  * input space (financial tokens + noise). */
class PropertySpec extends AnyFunSuite {
  private def check(n: Int)(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val vocab = Gen.oneOf(
    "RON", "EUR", "ON", "RO", "R", "E", "N", "158.065.856", "42", "42.916.476",
    "1", "234.567", "84", "%", "-", "45,40%", "(", ")", "420", "31/12/20",
    "31/12/2024", "30/09/2025", "profit", "cifra", "Indicatori", "ƒ^+%", "∆ %",
    "a", "I", "x", "yz", "finan", "c", "iar", "]", "[", "139.369.", ".961.31",
    "058", "7", "SOLD", "C", "mil.", "9L", "2024", "vs", "Q1", "active",
    "cheltuiel", "de", "Într-o")
  private val cellGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, vocab)).map(_.mkString(" "))

  // NOTE: full-domain idempotence is intentionally NOT asserted — the
  // reference chain itself is not idempotent (e.g. strip("[]") can expose
  // leading whitespace the later steps keep), and the differential fuzz
  // pins our port to the reference byte-for-byte on exactly such inputs.
  // The true invariant: canonical (already-clean) forms are fixed points.
  private val canonical = Seq(
    "RON 158.065.856", "EUR 36.549.554", "RON (25.604)", "24,66%", "-81,10%",
    "Δ%", "RON 471.371", "EUR (420)", "31/12/2024", "CIFRA DE AFACERI NETA",
    "Indicatori", "30/09/2025")

  test("canonical clean forms are fixed points of the cell chain") {
    for (s <- canonical)
      assert(CellClean.cleanTableCellText(s) == s, s)
  }

  test("canonical header forms are fixed points of the header chain") {
    for (s <- Seq("Indicatori", "30/09/2025", "Δ%", "CIFRA DE AFACERI NETA"))
      assert(CellClean.cleanHeaderText(s) == s, s)
  }

  test("the chain converges to a fixed point within token-count applications") {
    // each application strips at most ONE trailing bracket (the reference's
    // per-pass strip — CPython-parity pinned by the differential fuzz), so
    // an input ending in k strippable tokens legitimately needs k passes;
    // the true invariant is bounded convergence, not a fixed 3-pass bound
    // (a 1-in-~50k seed used to flake the old 3-pass assertion)
    check(500)(Prop.forAll(cellGen) { s =>
      val bound = s.count(_ == ' ') + 4
      var cur = s
      var prev: String = null
      var i = 0
      while (i < bound && cur != prev) {
        prev = cur
        cur = CellClean.cleanTableCellText(cur)
        i += 1
      }
      cur == prev
    })
  }

  test("whitespace normalization is idempotent") {
    check(300)(Prop.forAll(cellGen) { s =>
      val doubled = s.replace(" ", "  ")
      val once = Whitespace.normalizeTextWhitespace(doubled)
      Whitespace.normalizeTextWhitespace(once) == once
    })
  }

  test("a successful glyph reconstruction never still needs a spacing fix") {
    // the reference's own acceptance invariant (pymupdf_spacing_fix.py:410):
    // repairs are only accepted when the result passes the damage predicates
    check(200)(Prop.forAll(Gen.listOfN(5, Gen.oneOf("viteza", "de", "rotatie", "a",
      "activelor", "cheltuieli", "financiare", "profit", "net"))) { words =>
      val phrase = words.mkString(" ")
      var x = 0.0
      val glyphs = phrase.flatMap { ch =>
        if (ch == ' ') { x += 2.5; None }
        else { val g = SpacingRepair.Glyph(ch.toString, x, 0, x + 1.0, 2.0); x += 1.1; Some(g) }
      }
      val rebuilt = SpacingRepair.reconstructFromChars(glyphs)
      rebuilt == Py.joinSplit(phrase) &&
        (!Predicates.isSpacedText(rebuilt) || phrase.split(" ").exists(_.length == 1))
    })
  }

  test("normalizeNumber is stable under repetition") {
    check(50)(Prop.forAll(Gen.oneOf("1,5", "158.065.856", "1.234,5", "1,234.5",
      "24,66%", "42")) { s =>
      val once = Numbers.normalizeNumber(s)
      Numbers.normalizeNumber(once) == once
    })
  }
}
