package graft.sources

import graft.model._
import graft.extract.{DocTransforms, MarkdownRender}
import java.util.Random

/** Deterministic Common-Crawl-style pages generator (BASELINE.json
  * input_hint schema: url, warc_ts, html, text, lang).
  *
  * Each url seeds a content plan -> a "dirty" item tree carrying the
  * reference's known artifacts (mojibake, ligatures, split/duplicated
  * currency cells, header-group spans, currency flips, chart-noise text
  * inside picture bboxes, KPI blocks, orphan/repeated headings). The tree is
  * rendered to HTML with added boilerplate (nav/footer/aside link farms,
  * scripts, comments); the engine must parse the HTML, strip the
  * boilerplate, apply the transform battery and reproduce
  * `expectedMarkdown`/`expectedText` byte-for-byte per url.
  *
  * No wall-clock or global RNG anywhere: everything derives from (seed, i).
  */
object SyntheticPages {
  val BaseEpochMs: Long = 1767225600000L // 2026-01-01T00:00:00Z, fixed

  // ---- content plan ------------------------------------------------------

  private val Sentences = Array(
    "Compania a inregistrat rezultate solide in primele noua luni ale anului.",
    "Cresterea productiei de lapte a sustinut avansul veniturilor operationale.",
    "Investitiile strategice au vizat automatizarea proceselor din ferme.",
    "Evolutia preturilor a avut un impact direct asupra marjelor nete.",
    "Perspectivele pentru trimestrul urmator raman prudente dar pozitive.",
    "Cheltuielile financiare au crescut odata cu extinderea capacitatii.",
    "Fluxul de numerar operational a acoperit integral investitiile curente.",
    "Gradul de indatorare a ramas sub pragul asumat prin strategie.")

  private val MojibakeSentences = Array(
    ("SubvenÈ›ii pentru investiÈ›ii au fost incasate integral.",
      "Subvenții pentru investiții au fost incasate integral."),
    ("ProducÈ›ia vegetalÄƒ este inregistrata la cost standard.",
      "Producția vegetală este inregistrata la cost standard."))

  private val LigatureSentences = Array(
    "Proﬁtul operational reﬂecta eﬁcienta programului de modernizare.")

  private val RowLabels = Array(
    "CIFRA DE AFACERI NETA", "VENITURI DIN EXPLOATARE TOTAL",
    "CHELTUIELI CU PERSONALUL", "ALTE CHELTUIELI DE EXPLOATARE",
    "PROFITUL SAU PIERDEREA DIN EXPLOATARE", "VENITURI FINANCIARE TOTAL",
    "CHELTUIELI TOTALE", "ACTIVE IMOBILIZATE", "ACTIVE CIRCULANTE",
    "CAPITALURI PROPRII")

  /** (dirty cell, value) pairs drawn from the reference fixture battery —
    * the clean form is computed by the transform chain itself. */
  private val DirtyNumberCells = Array(
    "168.506.901 RON", "78. RON 78.947.449", "16. EUR 16.559.155 R",
    "RON 418.244.920 N", "153.689.723 RON 153.689.723 RON",
    "16 RON 164.980.067 RON", "RON 78.947.449 ON", "126.39 ON 126.397.863 RON",
    "RON 139.369. 058 RON", "115.784.991 RON 7", "7 RO 133.339.798 R",
    "EUR ( 420 )", "RON 471.371]", "42 42.916.476", "1 234.567", "- 45,40%",
    "84 % 84 %")

  private val CleanNumberCells = Array(
    "RON 158.065.856", "RON 126.792.531", "EUR 36.549.554", "EUR 29.318.226",
    "RON 245.140.981", "RON 21.533.034", "EUR 4.979.082", "RON 25.578.450",
    "RON (25.604)", "EUR (5.920)", "24,66%", "-81,10%", "27,17%", "3,50%")

  private val KpiBlocks = Array(
    ("CIFRA DE AFACERI", "RON 158,06 MIL. (EUR 31,08 MIL.)", "+24,66% vs 9L 2024"),
    ("ACTIVE CIRCULANTE", "RON 132,07 MIL. (EUR 25,99 MIL.)", "+14,07% vs 31.12.2024"),
    ("PROFIT NET", "RON 42,92 MIL. (EUR 8,45 MIL.)", "+103,61% vs 9L 2024"))

  private val AxisLines = Array("74% 9L 2025", "0 20 40 60 80", "Q1 Q2 Q3 2025")

  private val Headings = Array(
    "Analiza rezultatelor financiare", "Pozitia financiara consolidata",
    "Evolutia fluxurilor de numerar", "Structura costurilor operationale",
    "Perspective si riscuri")

  def url(i: Long): String = s"https://corpus.example/reports/doc-$i.html"

  private def pick[T](rng: Random, a: Array[T]): T = a(rng.nextInt(a.length))

  /** Build the dirty item tree for doc i. */
  def dirtyDoc(seed: Long, i: Long): Doc = dirtyDoc(seed, i, 1)

  /** pageScale > 1 multiplies the page count — the skew-rehearsal's
    * "pathological giant document" knob (a 100x doc through the SAME
    * generator, not a synthetic blob). Default 1 keeps every oracle-pinned
    * closed form unchanged. */
  def dirtyDoc(seed: Long, i: Long, pageScale: Int): Doc = {
    val rng = new Random(seed ^ (i * 0x9E3779B97F4A7C15L))
    val u = url(i)
    val nPages = (1 + rng.nextInt(4)) * math.max(1, pageScale) // 1..4 (x scale)
    val repeatedHeading = nPages >= 3
    val items = scala.collection.mutable.ArrayBuffer.empty[DocItem]
    val pages = scala.collection.mutable.ArrayBuffer.empty[PageDim]
    var idx = 0
    def add(kind: String, label: String, pageNo: Int, text: String,
            bbox: Option[Bbox] = None, table: Option[TableData] = None): Unit = {
      items += DocItem(idx, kind, label, ContentLayer.Body, pageNo, bbox, text, table)
      idx += 1
    }

    for (p <- 1 to nPages) {
      val pageH = 800.0
      pages += PageDim(p, 0.0, pageH)
      if (p == 1) add(ItemKind.Text, Label.Title, p, "Raport financiar interimar " + (2020 + (i % 7)))
      if (repeatedHeading) add(ItemKind.Text, Label.SectionHeader, p, "Analiza rezultatelor financiare")
      else add(ItemKind.Text, Label.SectionHeader, p, pick(rng, Headings))

      // body paragraphs with occasional encoding/whitespace dirt
      val nParas = 2 + rng.nextInt(3)
      for (_ <- 0 until nParas) {
        rng.nextInt(6) match {
          case 0 => add(ItemKind.Text, Label.Text, p, pick(rng, MojibakeSentences)._1)
          case 1 => add(ItemKind.Text, Label.Text, p, pick(rng, LigatureSentences))
          case 2 => add(ItemKind.Text, Label.Text, p,
            "Gradul de indatorare ramane stabil fata de A  B")
          case _ => add(ItemKind.Text, Label.Text, p, pick(rng, Sentences))
        }
      }

      // a KPI block triple (merged downstream at markdown level)
      if (rng.nextInt(2) == 0) {
        val (label, v1, v2) = pick(rng, KpiBlocks)
        add(ItemKind.Text, Label.Text, p, label)
        add(ItemKind.Text, Label.Text, p, v1)
        add(ItemKind.Text, Label.Text, p, v2)
      }

      // standalone chart-axis residue (removed at markdown level, kept in text)
      if (rng.nextInt(3) == 0) add(ItemKind.Text, Label.Text, p, pick(rng, AxisLines))

      // picture with overlapping chart noise (deleted by spatial transforms);
      // half the pictures carry KPI-like region text (the KPI_OCR channel)
      if (rng.nextInt(2) == 0) {
        val picBox = Bbox(40, 100, 300, 320, Bbox.TopLeft)
        val picText =
          if (rng.nextInt(2) == 0)
            "CIFRA DE AFACERI\nNETA ANUALA\nRON\n158,06 MIL.\n(EUR 31,08 MIL.)\n+24,66%\nvs\n9L " + (2020 + i % 7)
          else ""
        add(ItemKind.Picture, Label.Picture, p, picText, bbox = Some(picBox))
        // only some pictures come with an existing caption: the KPI caption
        // pass must skip those (reference `if item.captions: continue`)
        if (rng.nextInt(2) == 0)
          add(ItemKind.Text, Label.Caption, p, "Evolutia indicatorului cheie pe noua luni")
        // date-only inside the picture -> deleted
        add(ItemKind.Text, Label.Text, p, "31.12.2024",
          bbox = Some(Bbox(60, 120, 110, 140, Bbox.TopLeft)))
        // axis text inside the picture, BOTTOMLEFT origin exercise
        add(ItemKind.Text, Label.Text, p, "20 40 60 mil. RON",
          bbox = Some(Bbox(60, pageH - 150, 160, pageH - 170, Bbox.BottomLeft)))
        // date-only OUTSIDE any picture -> kept in tree (axis post-pass may drop from md)
        add(ItemKind.Text, Label.Text, p, "30.09.2025",
          bbox = Some(Bbox(500, 700, 560, 720, Bbox.TopLeft)))
      }

      // financial table with header groups + dirty cells + currency flip
      if (rng.nextInt(3) != 0) {
        val nDataRows = 3 + rng.nextInt(3)
        val cells = scala.collection.mutable.ArrayBuffer.empty[TableCell]
        // header row: label col + two 2-col groups + delta col (7 raw cols)
        def hc(c0: Int, c1: Int, text: String) =
          TableCell(0, 1, c0, c1, 1, c1 - c0, text, columnHeader = true,
            rowHeader = false, rowSection = false, fillable = false, bbox = None)
        cells += hc(0, 1, "Indicatori Indicatori") // halved by header clean
        cells += hc(1, 3, "31.12.202230/09/2025")  // fuzzy date repair; group spans cur+value
        cells += hc(3, 4, "30/09/2024")            // dirty-cell column cleans standalone
        cells += hc(4, 5, "30/09/2025")
        cells += hc(5, 6, "∆ %")                   // -> Δ%
        val dominantCur = if (rng.nextBoolean()) "RON" else "EUR"
        for (r <- 1 to nDataRows) {
          def dc(c: Int, text: String) =
            TableCell(r, r + 1, c, c + 1, 1, 1, text, columnHeader = false,
              rowHeader = false, rowSection = false, fillable = false, bbox = None)
          // exercise rowspan: with >=4 data rows the first label spans 2 rows
          if (r == 1 && nDataRows >= 4)
            cells += TableCell(1, 3, 0, 1, 2, 1, RowLabels(rng.nextInt(RowLabels.length)),
              columnHeader = false, rowHeader = false, rowSection = false,
              fillable = false, bbox = None)
          else if (r == 2 && nDataRows >= 4)
            () // label column covered by the rowspan above
          else
            cells += dc(0, RowLabels((rng.nextInt(RowLabels.length))))
          // currency+value split across the 2-col group (collapse merges them)
          val flip = r == nDataRows && nDataRows >= 3
          val cur = if (flip) (if (dominantCur == "RON") "EUR" else "RON") else dominantCur
          cells += dc(1, cur)
          cells += dc(2, (100 + rng.nextInt(900)).toString + "." +
            (100 + rng.nextInt(900)).toString + "." + (100 + rng.nextInt(900)).toString)
          cells += dc(3, pick(rng, DirtyNumberCells))
          cells += dc(4, pick(rng, CleanNumberCells))
          cells += dc(5, (if (rng.nextBoolean()) "" else "-") + (1 + rng.nextInt(99)) + ",5%")
        }
        add(ItemKind.Table, Label.Table, p, "",
          table = Some(TableData(nDataRows + 1, 6, cells.toArray)))
      }

      // list block
      if (rng.nextInt(3) == 0) {
        add(ItemKind.Text, Label.ListItem, p, "Majorarea capitalului social subscris")
        add(ItemKind.Text, Label.ListItem, p, "Extinderea suprafetei agricole exploatate")
      }

      // orphan heading at the very end of a non-final page, followed by a
      // same-level heading on the next page -> dropped by post-chain
      if (p < nPages && rng.nextInt(3) == 0)
        add(ItemKind.Text, Label.SectionHeader, p, "Profit din exploatare")
    }

    Doc(u, items.toArray, pages.toArray)
  }

  // ---- HTML rendering (dirty tree + boilerplate noise) --------------------

  private def esc(s: String): String = {
    val basic = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // keep multi-space runs alive through HTML whitespace collapsing
    basic.replace("  ", "&nbsp;&nbsp;")
  }

  private def bboxAttr(b: Option[Bbox]): String = b match {
    case Some(bb) =>
      val orig = if (bb.origin == Bbox.TopLeft) "" else s""" data-origin="${bb.origin}""""
      s""" data-bbox="${bb.l},${bb.t},${bb.r},${bb.b}"$orig"""
    case None => ""
  }

  /** Render the dirty tree to HTML, inserting boilerplate the engine must
    * strip: nav/footer link farms, aside, script/style, comments, title. */
  def htmlFor(doc: Doc, seed: Long, i: Long): String = {
    val rng = new Random(seed ^ (i * 0x51_7C_C1_B7_27_22_0A_95L))
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html>\n<html><head><title>corpus mirror</title>"
    sb ++= "<style>body { margin:0 }</style>"
    sb ++= "<script>var trk=1;</script></head>\n<body>\n"
    sb ++= """<header><div class="logo">corpus example portal</div>"""
    sb ++= """<nav><ul><li><a href="/">Acasa</a></li><li><a href="/rapoarte">Rapoarte</a></li>"""
    sb ++= """<li><a href="/contact">Contact</a></li></ul></nav></header>"""
    sb ++= "<!-- rendered by corpus-mirror -->\n"

    val byPage = doc.items.groupBy(_.pageNo)
    val pageNos = doc.pages.map(_.pageNo)
    for (p <- pageNos) {
      val h = doc.pages.find(_.pageNo == p).map(_.height).getOrElse(0.0)
      sb ++= s"""<div class="page" data-page-height="$h">\n"""
      val pageItems = byPage.getOrElse(p, Array.empty)
      var k = 0
      while (k < pageItems.length) {
        val item = pageItems(k)
        item.kind match {
          case ItemKind.Text =>
            item.label match {
              case Label.Title => sb ++= s"<h1${bboxAttr(item.bbox)}>${esc(item.text)}</h1>\n"
              case Label.SectionHeader => sb ++= s"<h2${bboxAttr(item.bbox)}>${esc(item.text)}</h2>\n"
              case Label.ListItem =>
                // consume the whole contiguous run in place to preserve order
                sb ++= "<ul>\n"
                while (k < pageItems.length && pageItems(k).label == Label.ListItem) {
                  sb ++= s"<li>${esc(pageItems(k).text)}</li>\n"
                  k += 1
                }
                k -= 1
                sb ++= "</ul>\n"
              case Label.Caption => sb ++= s"<figcaption${bboxAttr(item.bbox)}>${esc(item.text)}</figcaption>\n"
              case _ =>
                // vary inline markup to exercise the tokenizer
                val body = rng.nextInt(4) match {
                  case 0 => s"<b>${esc(item.text)}</b>"
                  case 1 =>
                    val words = item.text.split(" ", 2)
                    if (words.length == 2) s"<em>${esc(words(0))}</em> ${esc(words(1))}" else esc(item.text)
                  case _ => esc(item.text)
                }
                sb ++= s"<p${bboxAttr(item.bbox)}>$body</p>\n"
            }
          case ItemKind.Picture =>
            val picAttr =
              if (item.text != null && item.text.nonEmpty)
                s""" data-picture-text="${esc(item.text).replace("\"", "&quot;")}""""
              else ""
            sb ++= s"""<img src="img$k.png"${bboxAttr(item.bbox)}$picAttr/>\n"""
          case ItemKind.Table =>
            item.table.foreach { t =>
              sb ++= s"<table${bboxAttr(item.bbox)}>\n"
              for (r <- 0 until t.numRows) {
                sb ++= "<tr>"
                for (cell <- t.cells.filter(_.startRow == r).sortBy(_.startCol)) {
                  val tag = if (r == 0) "th" else "td"
                  val cs = if (cell.colSpan > 1) s""" colspan="${cell.colSpan}"""" else ""
                  val rs = if (cell.rowSpan > 1) s""" rowspan="${cell.rowSpan}"""" else ""
                  sb ++= s"<$tag$cs$rs${bboxAttr(cell.bbox)}>${esc(cell.text)}</$tag>"
                }
                sb ++= "</tr>\n"
              }
              sb ++= "</table>\n"
            }
          case _ => ()
        }
        k += 1
      }
      sb ++= "</div>\n"
    }

    sb ++= """<aside><a href="/promo">Aboneaza-te la newsletter</a> <a href="/social">Distribuie</a></aside>"""
    sb ++= """<footer><p><a href="/termeni">Termeni</a> | <a href="/gdpr">GDPR</a> | <a href="/arhiva">Arhiva rapoarte</a></p></footer>"""
    sb ++= "</body></html>\n"
    sb.result()
  }

  // ---- expected outputs (same pure transforms the pipeline runs) ----------

  def expectedDoc(doc: Doc): Doc = DocTransforms.applyAll(doc)._1

  def expectedMarkdown(doc: Doc): String =
    MarkdownRender.postProcess(MarkdownRender.render(expectedDoc(doc)))

  def expectedText(doc: Doc): String =
    MarkdownRender.renderPlainText(expectedDoc(doc))

  /** Raw pre-transform plain text (the pages.text column). */
  def rawText(doc: Doc): String = MarkdownRender.renderPlainText(doc)

  // ---- row materialization -------------------------------------------------

  case class GeneratedPage(url: String, warc_ts: java.sql.Timestamp, html: Array[Byte],
                           text: String, lang: String)

  def page(seed: Long, i: Long): GeneratedPage = page(seed, i, 1)

  def page(seed: Long, i: Long, pageScale: Int): GeneratedPage = {
    val doc = dirtyDoc(seed, i, pageScale)
    val html = htmlFor(doc, seed, i)
    GeneratedPage(doc.url, new java.sql.Timestamp(BaseEpochMs + i * 60000L),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), rawText(doc), "ro")
  }

  /** Skew-rehearsal corpus row: a pathological mix over the same generator.
    *  - i % 10000 == 0: GIANT doc (pageScale x normal — AQE cannot split a
    *    row, so these become the extract stage's stragglers)
    *  - i % 10 in {1,2}: EXACT-TEMPLATE doc — content of template (i % 37),
    *    own url (20% of the corpus collapses to 37 exact classes)
    *  - i % 10 == 3: NEAR-DUP-TEMPLATE doc — template (i % 23) content plus
    *    one per-doc mutated trailing paragraph (10% forms ~23 LSH cliques
    *    that only the band-bucket cap keeps sub-quadratic)
    *  - else: the normal unique dirty doc. */
  def skewPage(seed: Long, i: Long, giantScale: Int = 100): GeneratedPage = {
    if (i % 10000 == 0) page(seed, i, giantScale)
    else if (i % 10 == 1 || i % 10 == 2) {
      val t = page(seed, 7000000L + (i % 37))
      t.copy(url = url(i), warc_ts = new java.sql.Timestamp(BaseEpochMs + i * 60000L))
    } else if (i % 10 == 3) {
      val t = page(seed, 8000000L + (i % 23))
      val mutation = s" Nota aditionala $i pentru exemplarul ${i % 1000} al seriei."
      t.copy(url = url(i),
        warc_ts = new java.sql.Timestamp(BaseEpochMs + i * 60000L),
        html = (new String(t.html, java.nio.charset.StandardCharsets.UTF_8)
          .replace("</body>", s"<p>$mutation</p></body>"))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        text = t.text + mutation)
    } else page(seed, i)
  }
}
