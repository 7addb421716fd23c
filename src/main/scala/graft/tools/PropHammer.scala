package graft.tools

import graft.textkit._
import scala.util.Random

/** Dev probe: hammer the PropertySpec invariants with millions of seeded
  * samples to surface the rare counterexample behind a flaky CI run. */
object PropHammer {
  private val vocab = Array(
    "RON", "EUR", "ON", "RO", "R", "E", "N", "158.065.856", "42", "42.916.476",
    "1", "234.567", "84", "%", "-", "45,40%", "(", ")", "420", "31/12/20",
    "31/12/2024", "30/09/2025", "profit", "cifra", "Indicatori", "ƒ^+%", "∆ %",
    "a", "I", "x", "yz", "finan", "c", "iar", "]", "[", "139.369.", ".961.31",
    "058", "7", "SOLD", "C", "mil.", "9L", "2024", "vs", "Q1", "active",
    "cheltuiel", "de", "Într-o")

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000000
    val rnd = new Random(12345)
    var bad = 0
    for (i <- 0 until n) {
      val k = 1 + rnd.nextInt(8)
      val s = Seq.fill(k)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      // bounded convergence (the spec's invariant)
      val bound = s.count(_ == ' ') + 4
      var cur = s
      var prev: String = null
      var it = 0
      while (it < bound && cur != prev) { prev = cur; cur = CellClean.cleanTableCellText(cur); it += 1 }
      if (cur != prev) {
        bad += 1
        if (bad <= 5) println(s"CONVERGE FAIL: ${repr(s)} stuck at ${repr(cur)}")
      }
      // glyph reconstruction acceptance (PropertySpec's third property)
      if (i % 10 == 0) {
        val ws = Array("viteza", "de", "rotatie", "a",
          "activelor", "cheltuieli", "financiare", "profit", "net")
        val phraseWords = Seq.fill(5)(ws(rnd.nextInt(ws.length)))
        val phrase = phraseWords.mkString(" ")
        var x = 0.0
        val glyphs = phrase.flatMap { ch =>
          if (ch == ' ') { x += 2.5; None }
          else {
            val g = SpacingRepair.Glyph(ch.toString, x, 0, x + 1.0, 2.0); x += 1.1; Some(g)
          }
        }
        val rebuilt = SpacingRepair.reconstructFromChars(glyphs)
        val ok = rebuilt == Py.joinSplit(phrase) &&
          (!Predicates.isSpacedText(rebuilt) || phrase.split(" ").exists(_.length == 1))
        if (!ok) {
          bad += 1
          if (bad <= 5) println(s"GLYPH FAIL: ${repr(phrase)} -> ${repr(rebuilt)}")
        }
      }
      // whitespace idempotence
      val doubled = s.replace(" ", "  ")
      val once = Whitespace.normalizeTextWhitespace(doubled)
      if (Whitespace.normalizeTextWhitespace(once) != once) {
        bad += 1
        if (bad <= 5) println(s"WS FAIL: ${repr(s)}")
      }
    }
    println(s"done: $bad failures over $n samples")
  }

  private def repr(s: String): String = "'" + s + "'"
}
