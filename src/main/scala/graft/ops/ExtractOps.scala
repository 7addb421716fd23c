package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.{HtmlExtract, DocTransforms, MarkdownRender, Pipeline}
import graft.textkit._

/** Extraction-domain operators exposed as queries. These are the engine's
  * own semantics (HTML parse, transform battery, markdown render, audit,
  * glyph spacing repair, multimodal plumbing) — not SQL-expressible, so the
  * driver records rows-only checks; byte-level correctness is pinned by the
  * golden tests instead.
  */
object ExtractOps {
  /** Deterministic HTML wrapper for a driver-provided document row: the
    * text becomes paragraphs/headings, boilerplate noise is added, so the
    * full extraction stack runs over driver data. */
  def htmlFromText(docId: Long, text: String, lang: String): String = {
    val words = text.split(" ")
    val sb = new StringBuilder
    sb ++= "<html><head><title>doc</title><script>t()</script></head><body>"
    sb ++= "<nav><a href='/'>home</a> <a href='/a'>all</a> <a href='/b'>more</a></nav>"
    sb ++= s"""<div class="page" data-page-height="800">"""
    sb ++= s"<h1>Document $docId</h1>"
    // paragraphs of 12 words; every third group gets a heading
    var i = 0
    var para = 0
    while (i < words.length) {
      val chunk = words.slice(i, i + 12).mkString(" ")
      if (para % 3 == 2) sb ++= s"<h2>Section ${para / 3 + 1} $lang</h2>"
      sb ++= s"<p>$chunk</p>"
      i += 12
      para += 1
    }
    sb ++= "</div><footer><a href='/t'>terms</a> <a href='/p'>privacy</a></footer></body></html>"
    sb.result()
  }

  /** Flagship: full extraction pipeline over the documents table wrapped in
    * HTML. One shuffle (bucket repartition), parse in mapPartitions. */
  def extractDocuments(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pages = s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text", $"lang")
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        (s"doc://$id", htmlFromText(id, text, lang).getBytes("UTF-8"), text, lang)
      }
      .toDF("url", "html", "text", "lang")
    Pipeline.extract(s, pages, numBuckets = 16)
      .toDF()
      .select($"url", $"page_count", $"item_count", $"table_count",
        length($"markdown").as("md_chars"), length($"text").as("text_chars"))
      .orderBy($"url")
  }

  /** Audit metrics over the synthetic corpus extraction (self-audit: the
    * rendered markdown must fully cover its own item tree). */
  def auditSynthetic(s: SparkSession, n: Int = 64): DataFrame = {
    import s.implicits._
    s.createDataset(0L until n.toLong)
      .map { i =>
        val dirty = graft.sources.SyntheticPages.dirtyDoc(42L, i)
        val html = graft.sources.SyntheticPages.htmlFor(dirty, 42L, i)
        val parsed = HtmlExtract.parse(dirty.url, html)
        val (doc, _) = DocTransforms.applyAll(parsed)
        val md = MarkdownRender.render(doc)
        graft.audit.Audit.auditDocVsMarkdown(doc, md)
      }
      .toDF()
      .orderBy($"url")
  }

  /** Spacing predicate battery over driver documents (UDF surface). */
  def spacingFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spacedU = udf((t: String) => Predicates.isSpacedText(t))
    val multiU = udf((t: String) => Predicates.isMultiSpaceText(t))
    val collapsedU = udf((t: String) => Predicates.isCollapsedText(t))
    val qualityU = udf((t: String) => Quality.scoreMarkdown(t).score)
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id",
        spacedU($"text").as("is_spaced"),
        multiU($"text").as("is_multi_space"),
        collapsedU($"text").as("is_collapsed"),
        qualityU($"text").as("quality_score"))
      .orderBy($"doc_id")
  }

  /** Glyph-run spacing repair, distributed: synthesize deterministic glyph
    * rows (chars + boxes with kerning/word gaps) from document text, run the
    * 2-means reconstruction kernel per row, verify round trip. */
  def glyphRepair(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val phrase = text.take(80)
        // lay out glyphs: 1.0-wide chars, 0.1 kern gaps, 2.5 word gaps
        var x = 0.0
        val glyphs = phrase.flatMap { ch =>
          if (ch == ' ') { x += 2.5; None }
          else { val g = SpacingRepair.Glyph(ch.toString, x, 0, x + 1.0, 2.0); x += 1.1; Some(g) }
        }
        val rebuilt = SpacingRepair.reconstructFromChars(glyphs)
        (id, phrase.length, rebuilt.length, rebuilt == Py.joinSplit(phrase).strip())
      }
      .toDF("doc_id", "phrase_len", "rebuilt_len", "roundtrip_ok")
      .orderBy($"doc_id")
  }

  /** Multimodal column plumbing: opaque binary payloads with typed metadata.
    * The decode step is a STUB (no image/audio codecs in this environment):
    * a deterministic fake header parse + byte-histogram features. The Spark
    * shape — binary column, batched mapPartitions, fixed-width feature
    * vector — is the real, tested part. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val media = Option(text).getOrElse("").getBytes("UTF-8") // stands in for image/audio bytes
          // STUB decode: fake header = (width, height) from first bytes.
          // A real deployment swaps in an actual codec here; the schema,
          // batching, and feature shape stay identical.
          val width = if (media.isEmpty) 1 else 1 + (media(0) & 0x7F)
          val height = if (media.isEmpty) 1 else 1 + (media(media.length / 2) & 0x7F)
          val hist = new Array[Long](8)
          var i = 0
          while (i < media.length) { hist((media(i) & 0xFF) / 32) += 1; i += 1 }
          val total = media.length.toDouble
          var entropy = 0.0
          for (h <- hist if h > 0) {
            val p = h / total
            entropy -= p * math.log(p) / math.log(2)
          }
          (id, media.length, width, height, hist, math.rint(entropy * 1e6) / 1e6)
        }
      }
      .toDF("doc_id", "n_bytes", "width", "height", "byte_hist", "entropy")
      .orderBy($"doc_id")
  }

  /** Cell-clean chain applied distributed over a generated dirty-cell table
    * (the reference fixture battery cross-joined with driver doc ids). */
  def cleanCells(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cleanU = udf((t: String) => CellClean.cleanTableCellText(t))
    val suspectU = udf((t: String) => CellClean.isSuspectCurrencyCell(t))
    val dirtyCells = Seq(
      "84 % 84 %", "42 42.916.476", "1 234.567", "ƒ^+%", "78. RON 78.947.449",
      "168.506.901 RON", "153.689.723 RON 153.689.723 RON", "- 45,40%",
      "EUR ( 420 )", "31/12/20 31/12/2024", "EUR .961.31").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    s.createDataset(dirtyCells).toDF("cell_id", "dirty")
      .select($"cell_id", $"dirty", cleanU($"dirty").as("clean"),
        suspectU(cleanU($"dirty")).as("still_suspect"))
      .orderBy($"cell_id")
  }

  /** Worst-pages top-k: per-(url,page) audit, rank ascending by coverage,
    * keep the 5 weakest pages per doc (window over audit rows). */
  def worstPages(s: SparkSession, n: Int = 64, k: Int = 5): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val audits = s.createDataset(0L until n.toLong)
      .flatMap { i =>
        val dirty = graft.sources.SyntheticPages.dirtyDoc(42L, i)
        val html = graft.sources.SyntheticPages.htmlFor(dirty, 42L, i)
        val parsed = HtmlExtract.parse(dirty.url, html)
        val (doc, _) = DocTransforms.applyAll(parsed)
        val md = MarkdownRender.postProcess(MarkdownRender.render(doc))
        graft.audit.Audit.auditPerPage(doc, md)
      }.toDF()
    val w = Window.partitionBy($"url").orderBy($"tokenCoverage".asc, $"pageNo".asc)
    audits.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .select($"url", $"pageNo", round($"tokenCoverage", 6).as("token_coverage"), $"rank")
      .orderBy($"url", $"rank")
  }

  /** OCR merge flow over synthesized (base, ocr) doc pairs: suspect numeric
    * cells and spaced cells replaced per the reference acceptance rules. */
  def ocrMerge(s: SparkSession, n: Int = 200): DataFrame = {
    import s.implicits._
    s.createDataset(0L until n.toLong).map { i =>
      val cell = graft.model.TableCell(1, 2, 0, 1, 1, 1, "RON 71.371",
        columnHeader = false, rowHeader = false, rowSection = false, fillable = false,
        bbox = Some(graft.model.Bbox(0, 0, 50, 10, graft.model.Bbox.TopLeft)))
      val spacedCell = cell.copy(startCol = 1, endCol = 2, text = "finan c iar " + i,
        bbox = Some(graft.model.Bbox(60, 0, 110, 10, graft.model.Bbox.TopLeft)))
      def doc(cells: Array[graft.model.TableCell]) = graft.model.Doc(s"pair://$i", Array(
        graft.model.DocItem(0, graft.model.ItemKind.Table, graft.model.Label.Table,
          graft.model.ContentLayer.Body, 1, None, "",
          Some(graft.model.TableData(2, 2, cells)))),
        Array(graft.model.PageDim(1, 0, 800)))
      val base = doc(Array(cell, spacedCell))
      val ocr = doc(Array(cell.copy(text = "RON 471.371"),
        spacedCell.copy(text = "financiar " + i)))
      val (m1, suspectReplaced) = DocTransforms.mergeTableCellsWithOcr(base, ocr, spacedMode = false)
      val (_, spacedReplaced) = DocTransforms.mergeTableCellsWithOcr(m1, ocr, spacedMode = true)
      val repaired = DocTransforms.countSuspectTableCells(m1)
      (i, suspectReplaced, spacedReplaced, repaired)
    }.toDF("pair_id", "suspect_replaced", "spaced_replaced", "suspect_after")
      .orderBy($"pair_id")
  }

  /** Distributed spacing-fix routing: detect damaged pages, reconstruct the
    * spaced cell from synthesized positioned glyphs, verify recovery. */
  def spacingFixFlow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.textkit.SpacingRepair.Glyph
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val phrase = text.split(" ").take(6).mkString(" ")
        val spaced = phrase.flatMap(c => if (c == ' ') "  " else c.toString + " ").trim
        // lay out the CLEAN phrase as glyphs; the damaged cell must recover it
        var x = 0.0
        val glyphs = phrase.flatMap { ch =>
          if (ch == ' ') { x += 2.5; None }
          else { val g = Glyph(ch.toString, x, 0, x + 1.0, 2.0); x += 1.1; Some(g) }
        }
        val cell = graft.model.TableCell(0, 1, 0, 1, 1, 1, spaced,
          columnHeader = false, rowHeader = false, rowSection = false, fillable = false,
          bbox = Some(graft.model.Bbox(0, 0, x + 2, 2, graft.model.Bbox.TopLeft)))
        val doc = graft.model.Doc(s"doc://$id", Array(
          graft.model.DocItem(0, graft.model.ItemKind.Table, graft.model.Label.Table,
            graft.model.ContentLayer.Body, 1, None, "",
            Some(graft.model.TableData(1, 1, Array(cell))))),
          Array(graft.model.PageDim(1, 0, 800)))
        val pages = graft.extract.SpacingFix.detectSpacingPages(doc)
        val (fixed, report) = graft.extract.SpacingFix.fixSpacedItems(
          doc, Map(1 -> glyphs), pages)
        val out = fixed.items(0).table.get.cells(0).text
        (id, pages.map(_.size).getOrElse(-1), report.tableCells, out == phrase)
      }.toDF("doc_id", "damaged_pages", "cells_repaired", "recovered")
      .orderBy($"doc_id")
  }

  /** Backend auto-probe: page-1 quality argmax across parse configs. */
  def backendProbe(s: SparkSession, n: Int = 64): DataFrame = {
    import s.implicits._
    s.createDataset(0L until n.toLong).map { i =>
      val doc = graft.sources.SyntheticPages.dirtyDoc(42L, i)
      val html = graft.sources.SyntheticPages.htmlFor(doc, 42L, i)
      val (best, scores) = graft.extract.SpacingFix.probeBackend(doc.url, html)
      (doc.url, best, scores("standard"), scores("aggressive"))
    }.toDF("url", "chosen", "score_standard", "score_aggressive")
      .orderBy($"url")
  }

  /** Lossless JSON export of the parsed item tree (export_utils.py:31-37). */
  def docJson(s: SparkSession, n: Int = 16): DataFrame = {
    import s.implicits._
    s.createDataset((0L until n.toLong).map { i =>
      val d = graft.sources.SyntheticPages.dirtyDoc(42L, i)
      (d.url, d)
    }).toDF("url", "doc")
      .select($"url", to_json($"doc").as("doc_json"))
      .withColumn("json_chars", length($"doc_json"))
      .orderBy($"url")
  }

  /** Pure-JVM PDF path: write a minimal PDF per document (text lines, Td/TJ
    * positioning), tokenize the content stream back into positioned glyphs,
    * reconstruct reading order via the 2-means kernel, verify round trip. */
  def pdfExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val words = text.split(" ")
          val lines = words.grouped(8).map(_.mkString(" ")).toSeq
          val pages = lines.grouped(12).map(_.toSeq).toSeq
          val pdf = graft.extract.SyntheticPdf.pdfFor(pages)
          val extracted = graft.extract.PdfText.extractText(pdf)
          val joined = (1 to pages.length).map(extracted(_)).mkString(" ")
          (id, pdf.length, pages.length, joined == text)
        }
      }
      .toDF("doc_id", "pdf_bytes", "n_pages", "roundtrip_ok")
      .orderBy($"doc_id")
  }

  /** Full pipeline over the PDF corpus (content-stream tokenize -> layout
    * parse -> transforms -> markdown), structural check per doc. */
  def pdfPipeline(s: SparkSession, n: Int = 128): DataFrame = {
    import s.implicits._
    val pages = s.createDataset((0L until n.toLong).map { i =>
      val (pdf, expected) = graft.sources.SyntheticPdfPages.pdfDoc(42L, i)
      (expected.url, pdf, "", "ro", expected.items.length, expected.pages.length)
    }).toDF("url", "html", "text", "lang", "expected_items", "expected_pages")
    val extracted = Pipeline.extract(s, pages.select($"url", $"html", $"text", $"lang"),
      numBuckets = 16).toDF()
    extracted.join(pages.select($"url", $"expected_items", $"expected_pages"), "url")
      .select($"url", $"item_count", $"expected_items", $"page_count", $"expected_pages",
        ($"item_count" === $"expected_items" && $"page_count" === $"expected_pages")
          .as("structure_ok"),
        length($"markdown").as("md_chars"))
      .orderBy($"url")
  }
}
