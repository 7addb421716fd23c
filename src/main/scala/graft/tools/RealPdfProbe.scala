package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: run the REAL long_report.pdf through the full extractOne
  * pipeline (PdfDoc glyphs -> PdfLayout blocks/tables -> transforms ->
  * markdown) — the reference CLI's primary use case, with no docling JSON. */
object RealPdfProbe {
  def main(args: Array[String]): Unit = {
    val pdf = Files.readAllBytes(Paths.get("/root/reference/examples/long_report.pdf"))
    val t0 = System.nanoTime()
    val row = graft.extract.Pipeline.extractOne("doc://long_report", pdf, "ro", 0)
    val ms = (System.nanoTime() - t0) / 1e6
    println(f"pages=${row.page_count} items=${row.item_count} tables=${row.table_count} " +
      f"md_chars=${row.md_chars} spacing_fixed=${row.spacing_fixed} ${ms}%.0f ms")
    Files.writeString(Paths.get("/tmp/real_pdf.md"), row.markdown)
    println("markdown -> /tmp/real_pdf.md")
  }
}

/** Metrics for the direct-PDF path vs the committed golden. */
object RealPdfMetrics {
  def main(args: Array[String]): Unit = {
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/long_report.pdf"))
    val want = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/examples/long_report.md"))
    val row = graft.extract.Pipeline.extractOne("doc://long_report", pdf, "ro", 0)
    val gotTokens = graft.textkit.Numbers.tokenize(row.markdown).toSet
    val wantTokens = graft.textkit.Numbers.tokenize(want)
    val cov = graft.textkit.Numbers.coverage(wantTokens, gotTokens)
    val wantNums = graft.textkit.Numbers.extractNumbers(want)
    val gotNums = graft.textkit.Numbers.extractNumbers(row.markdown)
    val recall = wantNums.count(gotNums.contains).toDouble / wantNums.size
    println(f"tables=${row.table_count} items=${row.item_count} coverage=$cov%.4f numrecall=$recall%.4f")
  }
}

/** What the direct path misses vs the golden. */
object RealPdfMissing {
  def main(args: Array[String]): Unit = {
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/long_report.pdf"))
    val want = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/examples/long_report.md"))
    val row = graft.extract.Pipeline.extractOne("doc://long_report", pdf, "ro", 0)
    val gotTokens = graft.textkit.Numbers.tokenize(row.markdown).toSet
    val wantTokens = graft.textkit.Numbers.tokenize(want)
    val missTok = wantTokens.filterNot(gotTokens.contains).distinct
    println("missing tokens (" + missTok.length + "): " + missTok.take(60).mkString(" | "))
    val wantNums = graft.textkit.Numbers.extractNumbers(want)
    val gotNums = graft.textkit.Numbers.extractNumbers(row.markdown)
    val missNum = wantNums.filterNot(gotNums.contains).toSeq.sorted
    println("missing numbers (" + missNum.size + "): " + missNum.take(60).mkString(" | "))
    // table inventory per page
    val doc = graft.extract.PdfLayout.buildDoc("doc://long_report", pdf)
    doc.items.filter(_.table.nonEmpty).foreach { it =>
      val t = it.table.get
      val first = t.cells.take(3).map(_.text).mkString(" / ")
      println(f"p${it.pageNo}%2d table ${t.numRows}x${t.numCols} bbox=${it.bbox.map(b => f"${b.t}%.0f-${b.b}%.0f").getOrElse("")} :: $first")
    }
  }
}

/** Dump glyph gap structure for lines that assemble glued. */
object GlueProbe {
  def main(args: Array[String]): Unit = {
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/long_report.pdf"))
    val doc = new graft.extract.PdfDoc.Document(pdf)
    for (pg <- doc.pages) {
      val sized = doc.interpretPageSized(pg)
      val lines = graft.textkit.SpacingRepair.clusterLines(sized.map(_.glyph))
      for (line <- lines) {
        val asm = graft.textkit.SpacingRepair.assembleLine(line)
        if (asm.contains("Cutoate") || asm.contains("fluxurilor") ||
            asm.contains("devaloriz")) {
          println(s"page ${pg.pageNo}: '$asm'")
          val gaps = line.sliding(2).collect { case Seq(a, b) =>
            f"${b.c}:${b.x0 - a.x1}%.2f" }.toSeq
          println("  widths: " + line.take(8).map(g => f"${g.c}:${g.width}%.2f").mkString(" "))
          println("  gaps: " + gaps.mkString(" "))
        }
      }
    }
  }
}

/** Dump the final doc items containing glued text. */
object GlueProbe2 {
  def main(args: Array[String]): Unit = {
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/long_report.pdf"))
    val doc = graft.extract.PdfLayout.buildDoc("doc://long_report", pdf)
    for (it <- doc.items if Option(it.text).exists(t =>
        t.contains("fluxurilord") || t.contains("obânzilor,de8") || t.contains("mijloacefixe") || t.contains("fluxurilor"))) {
      println(s"p${it.pageNo} ${it.kind}/${it.label}: '${it.text.take(150)}'")
    }
    for (it <- doc.items if it.table.nonEmpty;
         c <- it.table.get.cells if c.text.contains("Cutoate") || c.text.contains("devaloriz"))
      println(s"p${it.pageNo} tablecell: '${c.text.take(120)}'")
  }
}

/** Replicate PdfLayout.linesOf run-splitting for a glued line. */
object GlueProbe3 {
  def main(args: Array[String]): Unit = {
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/long_report.pdf"))
    val doc = new graft.extract.PdfDoc.Document(pdf)
    for (pg <- doc.pages if true) {
      val sized = doc.interpretPageSized(pg)
      val sizeOf = new java.util.IdentityHashMap[graft.textkit.SpacingRepair.Glyph, java.lang.Double]()
      for (sg <- sized) sizeOf.put(sg.glyph, sg.fontSize)
      for (items <- graft.textkit.SpacingRepair.clusterLines(sized.map(_.glyph))) {
        def sz(g: graft.textkit.SpacingRepair.Glyph): Double =
          Option(sizeOf.get(g)).map(_.doubleValue).getOrElse(12.0)
        val size0 = math.max(items.map(sz).max, 1.0)
        def splitRef(a: graft.textkit.SpacingRepair.Glyph, b: graft.textkit.SpacingRepair.Glyph): Double = {
          val m = math.min(sz(a), sz(b)); if (m <= 1.0) size0 else m
        }
        val runs = scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(items.head))
        for (Seq(a, b) <- items.sliding(2) if items.length > 1) {
          if (b.x0 - a.x1 > splitRef(a, b) * 1.5) runs += scala.collection.mutable.ArrayBuffer(b)
          else runs.last += b
        }
        val texts = runs.map(rg => graft.textkit.SpacingRepair.assembleLine(rg.toSeq)).toSeq
        if (texts.exists(t => t.contains("fluxurilord") || t.contains("obânzilor,de8") || t.contains("mijloacefixe"))) {
          println(s"p${pg.pageNo} line sizes=${items.map(sz).distinct.map(v => f"$v%.1f").mkString(",")}")
          for (rg <- runs) {
            val gaps = rg.toSeq.sliding(2).collect { case Seq(a, b) => b.x0 - a.x1 }.toSeq
            val mcw = graft.textkit.SpacingRepair.medianOr(
              rg.toSeq.filter(g => g.c.trim.nonEmpty).map(_.width))
            println(f"  run '${graft.textkit.SpacingRepair.assembleLine(rg.toSeq).take(60)}' mcw=$mcw%.2f gaps>=0: ${gaps.filter(_ >= 0).map(v => f"$v%.2f").mkString(" ")}")
          }
        }
      }
    }
  }
}

/** Dump VLine run structure for one page (why does a band (not) form?). */
object PageLines {
  def main(args: Array[String]): Unit = {
    val pageNo = if (args.length > 0) args(0).toInt else 10
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/examples/long_report.pdf"))
    val doc = new graft.extract.PdfDoc.Document(pdf)
    val pg = doc.pages.find(_.pageNo == pageNo).get
    val sized = doc.interpretPageSized(pg)
    val sizeOf = new java.util.IdentityHashMap[graft.textkit.SpacingRepair.Glyph, java.lang.Double]()
    for (sg <- sized) sizeOf.put(sg.glyph, sg.fontSize)
    for (items <- graft.textkit.SpacingRepair.clusterLines(sized.map(_.glyph))) {
      def sz(g: graft.textkit.SpacingRepair.Glyph): Double =
        Option(sizeOf.get(g)).map(_.doubleValue).getOrElse(12.0)
      val size0 = math.max(items.map(sz).max, 1.0)
      def splitRef(a: graft.textkit.SpacingRepair.Glyph, b: graft.textkit.SpacingRepair.Glyph): Double = {
        val m = math.min(sz(a), sz(b)); if (m <= 1.0) size0 else m
      }
      val posGaps = items.sliding(2).collect {
        case Seq(a, b) if b.x0 - a.x1 > 0 => b.x0 - a.x1 }.toSeq
      val medianPos = if (posGaps.nonEmpty) graft.textkit.Py.median(posGaps) else Double.MaxValue
      val runs = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(items.head))
      for (Seq(a, b) <- items.sliding(2) if items.length > 1) {
        val gap = b.x0 - a.x1; val ref = splitRef(a, b)
        if (gap > ref * 1.5 || gap > math.max(4.0 * medianPos, ref))
          runs += scala.collection.mutable.ArrayBuffer(b)
        else runs.last += b
      }
      val y = items.map(_.y0).min
      val rr = runs.map(rg => f"${rg.map(_.x0).min}%.0f'" +
        graft.textkit.SpacingRepair.assembleLineDirect(rg.toSeq).take(24) + "'").mkString(" | ")
      println(f"y=$y%5.0f sz=$size0%4.1f runs=${runs.length}: $rr")
    }
  }
}
