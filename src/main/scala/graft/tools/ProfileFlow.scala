package graft.tools

import graft.extract.Pipeline
import graft.extract.Pipeline.ExtractOptions

/** Attribution probe for the conversion decision flow: times extractOne
  * under each knob combination over the synthetic corpus (single thread). */
object ProfileFlow {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000)
    val docs = (0L until n.toLong).map { i =>
      val p = graft.sources.SyntheticPages.page(42L, i)
      (p.url, p.html, p.lang)
    }
    val variants = Seq(
      "all-off   " -> ExtractOptions(backendAuto = false, ocrMode = "off", spacingFix = false),
      "probe-only" -> ExtractOptions(backendAuto = true, ocrMode = "off", spacingFix = false),
      "ocr-only  " -> ExtractOptions(backendAuto = false, ocrMode = "auto", spacingFix = false),
      "spacing   " -> ExtractOptions(backendAuto = false, ocrMode = "off", spacingFix = true),
      "default   " -> ExtractOptions())
    // stage micro-attribution: suspect counting vs OCR merge, over raw parses
    locally {
      val parsedDocs = docs.map { case (u, h, _) =>
        graft.extract.HtmlExtract.parseDetailed(u, new String(h, "UTF-8"))
      }
      val stdDocs = parsedDocs.map(p => graft.extract.HtmlExtract.applyConfig(p, 0.4, 8))
      val ocrDocs = parsedDocs.map(p => graft.extract.HtmlExtract.applyConfig(p, 2.0, 0))
      for (_ <- 0 until 2) {
        var t0 = System.nanoTime()
        val flagged = stdDocs.count(d => graft.extract.DocTransforms.countSuspectTableCellsFast(d) > 0)
        val tCount = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        var merged = 0
        for ((d, o) <- stdDocs.zip(ocrDocs))
          if (graft.extract.DocTransforms.countSuspectTableCellsFast(d) > 0)
            merged += graft.extract.DocTransforms.mergeTableCellsWithOcr(d, o, spacedMode = false)._2
        val tMerge = (System.nanoTime() - t0) / 1e9
        println(f"suspect-count: ${tCount}%.2f s (flagged=$flagged)  count+merge: ${tMerge}%.2f s (replaced=$merged)")
      }
    }
    // warm-up every variant, then 3 interleaved rounds, best-of per variant
    for ((_, opts) <- variants; (u, h, l) <- docs.take(1000))
      Pipeline.extractOne(u, h, l, 0, opts)
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (round <- 0 until 3; (name, opts) <- variants) {
      val t0 = System.nanoTime()
      var retried = 0; var agg = 0
      for ((u, h, l) <- docs) {
        val r = Pipeline.extractOne(u, h, l, 0, opts)
        if (r.ocr_retried) retried += 1
        if (r.backend == "aggressive") agg += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      best(name) = math.max(best.getOrElse(name, 0.0), n / sec)
      if (round == 2)
        println(f"$name ${best(name)}%8.0f docs/s best-of-3  (ocr_retried=$retried agg=$agg)")
    }
  }
}
