package graft.sources

import graft.model._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Ingest a DoclingDocument JSON export (schema 1.x — the reference's
  * `--export-json` artifact, export_utils.py:31-37) into our item tree.
  *
  * Reading order mirrors doc.iterate_items(): a depth-first walk of
  * body.children refs; a picture's child text items follow the picture.
  * This is the two-channel entry point the repair flow is built for: the
  * text layer comes from Docling's ML parse, the glyph geometry from the
  * page — see Pipeline.repairDoc.
  */
object DoclingJsonIngest {
  private val mapper = new ObjectMapper()

  def parse(json: String, url: String): Doc = {
    val root = mapper.readTree(json)

    def nodeAt(ref: String): JsonNode = {
      // "#/texts/12" -> root.texts(12); path() (not get()) so a $ref into a
      // collection absent from the export (e.g. #/form_items/0, a legal
      // DoclingDocument child we don't model) resolves to a missing node the
      // visitor skips, instead of NPE-ing the whole ingest
      val parts = ref.stripPrefix("#/").split("/")
      root.path(parts(0)).path(parts(1).toInt)
    }

    def bboxOf(n: JsonNode): Option[Bbox] = Option(n).map { b =>
      Bbox(b.get("l").asDouble, b.get("t").asDouble, b.get("r").asDouble, b.get("b").asDouble,
        if (b.path("coord_origin").asText("TOPLEFT").equalsIgnoreCase("BOTTOMLEFT"))
          Bbox.BottomLeft
        else Bbox.TopLeft)
    }

    def provOf(n: JsonNode): (Int, Option[Bbox]) = {
      val prov = n.path("prov")
      if (prov.isArray && prov.size() > 0) {
        val p = prov.get(0)
        (p.path("page_no").asInt(0), bboxOf(p.get("bbox")))
      } else (0, None)
    }

    val items = scala.collection.mutable.ArrayBuffer.empty[DocItem]
    var idx = 0

    def tableOf(n: JsonNode): TableData = {
      val data = n.get("data")
      val cells = data.path("table_cells").elements().asScala.map { c =>
        TableCell(
          startRow = c.path("start_row_offset_idx").asInt,
          endRow = c.path("end_row_offset_idx").asInt,
          startCol = c.path("start_col_offset_idx").asInt,
          endCol = c.path("end_col_offset_idx").asInt,
          rowSpan = c.path("row_span").asInt(1),
          colSpan = c.path("col_span").asInt(1),
          text = c.path("text").asText(""),
          columnHeader = c.path("column_header").asBoolean(false),
          rowHeader = c.path("row_header").asBoolean(false),
          rowSection = c.path("row_section").asBoolean(false),
          fillable = c.path("fillable").asBoolean(false),
          bbox = bboxOf(c.get("bbox")))
      }.toArray
      TableData(data.path("num_rows").asInt, data.path("num_cols").asInt, cells)
    }

    def visit(ref: String, parentIdx: Int): Unit = {
      val n = nodeAt(ref)
      if (n.isMissingNode) return // unmodeled/absent collection: skip
      val (pageNo, bbox) = provOf(n)
      val layer = n.path("content_layer").asText(ContentLayer.Body)
      ref.stripPrefix("#/").split("/")(0) match {
        case "texts" =>
          items += DocItem(idx, ItemKind.Text, n.path("label").asText(Label.Text),
            layer, pageNo, bbox, n.path("text").asText(""), None, parentIdx)
          idx += 1
          // the schema permits children on any NodeItem (e.g. footnotes
          // under a paragraph) — drop nothing, keep depth-first order
          n.path("children").elements().asScala.foreach(c => visit(c.get("$ref").asText, parentIdx))
        case "pictures" =>
          val picIdx = idx
          items += DocItem(idx, ItemKind.Picture, Label.Picture, layer, pageNo, bbox, "", None)
          idx += 1
          // nested text items (chart labels, dates) follow their picture,
          // matching iterate_items' depth-first order
          n.path("children").elements().asScala.foreach(c => visit(c.get("$ref").asText, picIdx))
        case "tables" =>
          items += DocItem(idx, ItemKind.Table, n.path("label").asText(Label.Table),
            layer, pageNo, bbox, "", Some(tableOf(n)))
          idx += 1
          n.path("children").elements().asScala.foreach(c => visit(c.get("$ref").asText, -1))
        case "groups" =>
          n.path("children").elements().asScala.foreach(c => visit(c.get("$ref").asText, parentIdx))
        case "key_value_items" =>
          // GraphData: cells keyed by cell_id, links key -> value; unlinked
          // key cells keep an empty value
          val cells = n.path("graph").path("cells").elements().asScala.map { c =>
            c.path("cell_id").asInt -> (c.path("label").asText("key"), c.path("text").asText(""))
          }.toMap
          // a key cell may link to SEVERAL value cells (legal GraphData);
          // collect all targets in link order and space-join their text
          val linked = scala.collection.mutable.LinkedHashMap.empty[Int, Vector[Int]]
          n.path("graph").path("links").elements().asScala.foreach { l =>
            val src = l.path("source_cell_id").asInt
            linked(src) = linked.getOrElse(src, Vector.empty) :+
              l.path("target_cell_id").asInt
          }
          val pairs = cells.toSeq.sortBy(_._1).collect {
            case (id, ("key", keyText)) =>
              val valueText = linked.getOrElse(id, Vector.empty)
                .flatMap(cells.get).map(_._2).filter(_.nonEmpty).mkString(" ")
              KvPair(keyText, valueText)
          }.toArray
          items += DocItem(idx, ItemKind.KeyValue,
            n.path("label").asText(Label.KeyValueRegion), layer, pageNo, bbox,
            "", None, parentIdx, kv = Some(pairs))
          idx += 1
          n.path("children").elements().asScala.foreach(c => visit(c.get("$ref").asText, -1))
        case _ => ()
      }
    }

    root.path("body").path("children").elements().asScala
      .foreach(c => visit(c.get("$ref").asText, -1))

    val pages = root.path("pages").properties().asScala.map { e =>
      val p = e.getValue
      PageDim(p.path("page_no").asInt(e.getKey.toInt),
        p.path("size").path("width").asDouble(0.0),
        p.path("size").path("height").asDouble(0.0))
    }.toArray.sortBy(_.pageNo)

    Doc(url, items.toArray, pages)
  }
}
