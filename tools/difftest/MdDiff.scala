import graft.textkit.MarkdownPost
import java.util.Base64
object MdDiff { def main(a: Array[String]): Unit = {
  def d(s: String) = new String(Base64.getDecoder.decode(s), "UTF-8")
  var total = 0; var bad = 0
  for (line <- scala.io.Source.fromFile("/tmp/difftest/md_golden.tsv", "UTF-8").getLines()) {
    val f = line.split("\t", -1).map(d)
    val in = f(0)
    total += 1
    var md = in
    val steps = List[(String, String => String)](
      ("markers", MarkdownPost.addVisiblePageMarkers(_)),
      ("noise", m => MarkdownPost.reduceMarkdownNoise(m, removeImagePlaceholders = true)),
      ("kpi", MarkdownPost.normalizeKpiBlocks(_)),
      ("orphan", MarkdownPost.removeOrphanHeadings(_)),
      ("axis", MarkdownPost.removeAxisLikeLines(_)))
    var failed = false
    for (((name, fn), idx) <- steps.zipWithIndex if !failed) {
      md = fn(md)
      if (md != f(idx + 1)) {
        failed = true
        if (bad < 8) {
          println(s"MISMATCH step=$name case=$total")
          println("  input:    " + in.replace("\n", "\\n").take(300))
          println("  expected: " + f(idx + 1).replace("\n", "\\n").take(300))
          println("  got:      " + md.replace("\n", "\\n").take(300))
        }
        bad += 1
      }
    }
  }
  println(s"checked $total markdown chains, failures: $bad")
}}
