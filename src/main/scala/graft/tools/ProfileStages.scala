package graft.tools

import graft.extract.{DocTransforms, HtmlExtract, MarkdownRender, SpacingFix}

/** Per-stage attribution of extractOne over the synthetic bench corpus
  * (single thread): where does the per-document time actually go?
  * parse -> applyConfig -> probe -> transforms -> render -> post -> text. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000)
    val docs = (0L until n.toLong).map { i =>
      val p = graft.sources.SyntheticPages.page(42L, i)
      (p.url, new String(p.html, java.nio.charset.StandardCharsets.UTF_8), p.lang)
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    for (round <- 0 until 3) {
      val (parsed, tParse) = timed(docs.map { case (u, h, _) => HtmlExtract.parseDetailed(u, h) })
      val std = SpacingFix.Backends.head
      val (applied, tApply) = timed(parsed.map(p =>
        HtmlExtract.applyConfig(p, std.linkDensityThreshold, std.minContentChars)))
      val (scores, tProbe) = timed(applied.map(SpacingFix.probePage1Score))
      val (transformed, tTrans) = timed(applied.map(DocTransforms.applyAll))
      val (rendered, tRender) = timed(transformed.map { case (d, _) => MarkdownRender.render(d) })
      val (posted, tPost) = timed(rendered.map(md => MarkdownRender.postProcess(md)))
      val (texts, tText) = timed(transformed.map { case (d, _) => MarkdownRender.renderPlainText(d) })
      val total = tParse + tApply + tProbe + tTrans + tRender + tPost + tText
      if (round == 2) {
        println(f"parse=$tParse%6.2f apply=$tApply%6.2f probe=$tProbe%6.2f " +
          f"transforms=$tTrans%6.2f render=$tRender%6.2f post=$tPost%6.2f text=$tText%6.2f " +
          f"total=$total%6.2f s  (${n / total}%8.0f docs/s, probeSum=${scores.map(_.toLong).sum}, " +
          f"mdChars=${posted.map(_.length.toLong).sum}, txtChars=${texts.map(_.length.toLong).sum})")
        // applyAll sub-pass attribution
        var d = applied
        def sub(label: String)(f: graft.model.Doc => (graft.model.Doc, Int)): Unit = {
          val t0 = System.nanoTime()
          var changed = 0L
          d = d.map { x => val (nd, c) = f(x); changed += c; nd }
          println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (changed=$changed)")
        }
        sub("collapseDocTableGroups")(DocTransforms.collapseDocTableGroups)
        sub("normalizeDocTableHeaders")(DocTransforms.normalizeDocTableHeaders)
        sub("cleanDocTableCells")(DocTransforms.cleanDocTableCells)
        sub("normalizeDocTableCurrencies")(DocTransforms.normalizeDocTableCurrencies)
        sub("removeDateOnly")(DocTransforms.removeDateOnlyTextInsidePictures(_))
        sub("removeAxis")(DocTransforms.removeAxisTextInsidePictures(_))
        sub("addPictureKpiCaptions")(dd => SpacingFix.addPictureKpiCaptionsFromItems(dd))
        sub("normalizeDocTextWhitespace")(DocTransforms.normalizeDocTextWhitespace)
        // post-chain attribution
        var mds = rendered
        def postSub(label: String)(f: String => String): Unit = {
          val t0 = System.nanoTime()
          mds = mds.map(f)
          println(f"  post:$label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
            f"(chars=${mds.map(_.length.toLong).sum})")
        }
        postSub("addVisiblePageMarkers")(m => graft.textkit.MarkdownPost.addVisiblePageMarkers(m))
        postSub("reduceMarkdownNoise")(m =>
          graft.textkit.MarkdownPost.reduceMarkdownNoise(m, removeImagePlaceholders = true))
        postSub("normalizeKpiBlocks")(m => graft.textkit.MarkdownPost.normalizeKpiBlocks(m))
        postSub("removeOrphanHeadings")(m => graft.textkit.MarkdownPost.removeOrphanHeadings(m))
        postSub("removeAxisLikeLines")(m => graft.textkit.MarkdownPost.removeAxisLikeLines(m))
      }
    }
  }
}
