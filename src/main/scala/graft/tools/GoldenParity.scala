package graft.tools

import java.nio.file.{Files, Paths}

/** Iteration probe for reference-golden parity: ingest the reference's
  * docling JSON, run the transform battery + render + post-chain, diff
  * against the reference's committed markdown. */
object GoldenParity {
  def main(args: Array[String]): Unit = {
    val json = Files.readString(Paths.get("/root/reference/examples/long_report.docling.json"))
    val expected = Files.readString(Paths.get("/root/reference/examples/long_report.md"))
    val doc0 = graft.sources.DoclingJsonIngest.parse(json, "doc://long_report")
    println(s"items=${doc0.items.length} pages=${doc0.pages.length} " +
      s"tables=${doc0.items.count(_.table.nonEmpty)} " +
      s"pictures=${doc0.items.count(_.kind == graft.model.ItemKind.Picture)} " +
      s"texts=${doc0.items.count(_.kind == graft.model.ItemKind.Text)}")
    val (doc, counters) = graft.extract.DocTransforms.applyAll(doc0)
    println(s"counters=$counters")
    val md = graft.extract.MarkdownRender.postProcess(
      graft.extract.MarkdownRender.render(doc))
    println(s"md chars: got=${md.length} want=${expected.length}")
    println(s"tables: got=${graft.textkit.MarkdownPost.markdownTableCount(md)} " +
      s"want=${graft.textkit.MarkdownPost.markdownTableCount(expected)}")
    println(s"headings: got=${graft.textkit.MarkdownPost.markdownHeadingCount(md)} " +
      s"want=${graft.textkit.MarkdownPost.markdownHeadingCount(expected)}")
    // line diff: first 10 differing lines
    val gl = md.split("\n", -1)
    val wl = expected.split("\n", -1)
    println(s"lines: got=${gl.length} want=${wl.length}")
    var shown = 0
    var i = 0
    while (i < math.max(gl.length, wl.length) && shown < 10) {
      val g = if (i < gl.length) gl(i) else "<EOF>"
      val w = if (i < wl.length) wl(i) else "<EOF>"
      if (g != w) {
        println(s"line ${i + 1}:\n  got : ${g.take(160)}\n  want: ${w.take(160)}")
        shown += 1
      }
      i += 1
    }
    if (shown == 0) println("BYTE-IDENTICAL" + (if (md == expected) "" else " lines (trailing diff?)"))
    Files.writeString(Paths.get("/tmp/long_report_got.md"), md)
  }
}
// (exact-metric probe appended during round 2 — see Q44 in ExtractOps)
