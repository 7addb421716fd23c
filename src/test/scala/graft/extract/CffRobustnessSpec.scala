package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input pin for the CFF/Type1C reader (the xref-stream path got
  * the same treatment in PdfRobustnessSpec): binary INDEX offsets, charsets
  * and encodings from untrusted bytes must degrade (None or a partial
  * table), NEVER throw and never run away. Every mutation below calls
  * builtinEncoding directly — the tightest entry point over the parser. */
class CffRobustnessSpec extends AnyFunSuite {
  private val valid = TestPdfs.buildCff()

  test("sanity: the unmutated fixture still parses") {
    val enc = CffEncoding.builtinEncoding(valid)
    assert(enc.isDefined && enc.get(65) == "abreve")
  }

  test("every truncation point degrades cleanly") {
    for (n <- 0 to valid.length)
      CffEncoding.builtinEncoding(valid.take(n)) // must not throw
  }

  test("random single-bit flips never throw (2000 cases, fixed seed)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val mutated = valid.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      CffEncoding.builtinEncoding(mutated)
    }
  }

  test("random byte overwrites never throw (2000 cases, fixed seed)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 2000) {
      val mutated = valid.clone()
      var k = 0
      val hits = 1 + rnd.nextInt(4)
      while (k < hits) {
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        k += 1
      }
      CffEncoding.builtinEncoding(mutated)
    }
  }

  test("lying INDEX counts and offSizes degrade") {
    // Name INDEX count -> 0xFFFF
    val m1 = valid.clone(); m1(4) = 0xFF.toByte; m1(5) = 0xFF.toByte
    assert(CffEncoding.builtinEncoding(m1).isEmpty)
    // offSize -> 0 and -> 5 (spec range is 1..4)
    for (bad <- Seq(0, 5, 255)) {
      val m = valid.clone(); m(6) = bad.toByte
      CffEncoding.builtinEncoding(m)
    }
  }

  test("hostile Top DICT int32 operands (huge / negative / overlapping)") {
    // the three 5-byte operands live right after the Top DICT INDEX header;
    // locate them by the operator bytes (29 x x x x OP) pattern
    val positions = valid.zipWithIndex.collect {
      case (b, i) if (b & 0xFF) == 29 && i + 5 < valid.length &&
        Seq(15, 16, 17).contains(valid(i + 5) & 0xFF) => i
    }
    assert(positions.length == 3, s"expected 3 int32 operands, got ${positions.length}")
    for (pos <- positions; v <- Seq(0x7FFFFFFF, -1, valid.length - 1, valid.length, 1)) {
      val m = valid.clone()
      m(pos + 1) = ((v >> 24) & 0xFF).toByte
      m(pos + 2) = ((v >> 16) & 0xFF).toByte
      m(pos + 3) = ((v >> 8) & 0xFF).toByte
      m(pos + 4) = (v & 0xFF).toByte
      CffEncoding.builtinEncoding(m) // must not throw
    }
  }

  test("charset/encoding format bytes swept over 0..255") {
    // find the charset and encoding blocks via the valid fixture layout:
    // mutate EVERY byte position to each interesting format value
    for (at <- 0 until valid.length; v <- Seq(0, 1, 2, 3, 0x7F, 0x80, 0xFF)) {
      val m = valid.clone()
      m(at) = v.toByte
      CffEncoding.builtinEncoding(m)
    }
  }

  test("empty, tiny, and non-CFF inputs") {
    CffEncoding.builtinEncoding(Array.empty)
    CffEncoding.builtinEncoding(Array[Byte](1))
    CffEncoding.builtinEncoding(Array[Byte](1, 0, 4))
    assert(CffEncoding.builtinEncoding("not a font".getBytes).isEmpty)
    assert(CffEncoding.builtinEncoding(Array.fill(4096)(0xFF.toByte)).isEmpty)
  }
}
