package graft.sources

import graft.model._
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Write our item tree as a DoclingDocument 1.x JSON export — the reference
  * CLI's `--export-json` artifact shape (export_utils.py:32-38 persists
  * `doc.export_to_dict()`): `schema_name`/`version`, `body.children` $refs,
  * `texts`/`tables`/`pictures` collections with `prov` page/bbox entries,
  * and `pages` sizes. The exact inverse of [[DoclingJsonIngest]]:
  * `parse(write(doc)) == doc` item-for-item (round-trip pinned by
  * DoclingRoundTripSpec and q52), so pipelines can interchange artifacts
  * with reference users in the reference's own format.
  */
object DoclingJsonExport {
  private val mapper = new ObjectMapper()

  def write(doc: Doc): String = {
    val root = mapper.createObjectNode()
    root.put("schema_name", "DoclingDocument")
    root.put("version", "1.8.0")
    root.put("name", doc.url.stripPrefix("doc://"))
    val origin = root.putObject("origin")
    origin.put("mimetype", "application/pdf")
    origin.put("binary_hash", 0L)
    origin.put("filename", doc.url.stripPrefix("doc://"))

    val texts = mapper.createArrayNode()
    val tables = mapper.createArrayNode()
    val pictures = mapper.createArrayNode()
    val kvItems = mapper.createArrayNode()
    val body = root.putObject("body")
    body.put("self_ref", "#/body")
    val bodyChildren = body.putArray("children")
    body.put("content_layer", "body")
    body.put("name", "_root_")
    body.put("label", "unspecified")

    // collection slot per item, in idx order (ingest re-walks depth-first,
    // pictures' children nested, so emission order == idx order)
    case class Slot(ref: String, node: ObjectNode, childArray: ArrayNode)
    val slotOf = scala.collection.mutable.HashMap.empty[Int, Slot]

    def provOf(node: ObjectNode, item: DocItem): Unit = {
      val prov = node.putArray("prov")
      if (item.pageNo > 0 || item.bbox.nonEmpty) {
        val p = prov.addObject()
        p.put("page_no", item.pageNo)
        item.bbox.foreach { b =>
          val bb = p.putObject("bbox")
          bb.put("l", b.l); bb.put("t", b.t); bb.put("r", b.r); bb.put("b", b.b)
          bb.put("coord_origin", b.origin)
        }
        val cs = p.putArray("charspan")
        cs.add(0)
        cs.add(Option(item.text).map(_.length).getOrElse(0))
      }
    }

    for (item <- doc.items) {
      val (collection, arr) = item.kind match {
        case ItemKind.Table => ("tables", tables)
        case ItemKind.Picture => ("pictures", pictures)
        case ItemKind.KeyValue => ("key_value_items", kvItems)
        case _ => ("texts", texts)
      }
      val ref = s"#/$collection/${arr.size()}"
      val node = arr.addObject()
      node.put("self_ref", ref)
      node.put("content_layer", item.contentLayer)
      node.put("label", item.label)
      provOf(node, item)
      val children = node.putArray("children")
      item.kind match {
        case ItemKind.Table =>
          val data = node.putObject("data")
          val t = item.table.get
          data.put("num_rows", t.numRows)
          data.put("num_cols", t.numCols)
          val cells = data.putArray("table_cells")
          for (c <- t.cells) {
            val cn = cells.addObject()
            cn.put("start_row_offset_idx", c.startRow)
            cn.put("end_row_offset_idx", c.endRow)
            cn.put("start_col_offset_idx", c.startCol)
            cn.put("end_col_offset_idx", c.endCol)
            cn.put("row_span", c.rowSpan)
            cn.put("col_span", c.colSpan)
            cn.put("text", c.text)
            cn.put("column_header", c.columnHeader)
            cn.put("row_header", c.rowHeader)
            cn.put("row_section", c.rowSection)
            cn.put("fillable", c.fillable)
            c.bbox.foreach { b =>
              val bb = cn.putObject("bbox")
              bb.put("l", b.l); bb.put("t", b.t); bb.put("r", b.r); bb.put("b", b.b)
              bb.put("coord_origin", b.origin)
            }
          }
        case ItemKind.KeyValue =>
          // GraphData: cell ids 2r (key) / 2r+1 (value), one key->value link
          // per pair — the docling key_value_items graph shape
          val graph = node.putObject("graph")
          val cells = graph.putArray("cells")
          val links = graph.putArray("links")
          for ((p, r) <- item.kv.getOrElse(Array.empty).zipWithIndex) {
            val kc = cells.addObject()
            kc.put("cell_id", 2 * r)
            kc.put("label", "key")
            kc.put("text", p.key)
            kc.put("orig", p.key)
            val vc = cells.addObject()
            vc.put("cell_id", 2 * r + 1)
            vc.put("label", "value")
            vc.put("text", p.value)
            vc.put("orig", p.value)
            val ln = links.addObject()
            ln.put("source_cell_id", 2 * r)
            ln.put("target_cell_id", 2 * r + 1)
          }
        case _ =>
          node.put("orig", Option(item.text).getOrElse(""))
          node.put("text", Option(item.text).getOrElse(""))
      }
      val slot = Slot(ref, node, children)
      slotOf(item.idx) = slot
      // nesting: children attach to any already-emitted parent (every item
      // gets a children array); forward references and parentIdx<0 fall back
      // to body. The ingest only produces picture-parent nesting, so the
      // round-trip property is unchanged, but docs built by other means keep
      // their parent links on export.
      val parentArr = if (item.parentIdx >= 0 && slotOf.contains(item.parentIdx))
        slotOf(item.parentIdx).childArray
      else bodyChildren
      parentArr.addObject().put("$ref", ref)
      val parentRef = if (parentArr eq bodyChildren) "#/body" else slotOf(item.parentIdx).ref
      slot.node.putObject("parent").put("$ref", parentRef)
    }

    root.set("texts", texts)
    root.set("tables", tables)
    root.set("pictures", pictures)
    root.set("groups", mapper.createArrayNode())
    root.set("key_value_items", kvItems)
    root.set("form_items", mapper.createArrayNode())
    val furniture = root.putObject("furniture")
    furniture.put("self_ref", "#/furniture")
    furniture.putArray("children")
    furniture.put("content_layer", "furniture")
    furniture.put("name", "_root_")
    furniture.put("label", "unspecified")

    val pages = root.putObject("pages")
    for (p <- doc.pages) {
      val pn = pages.putObject(p.pageNo.toString)
      pn.put("page_no", p.pageNo)
      val size = pn.putObject("size")
      size.put("width", p.width)
      size.put("height", p.height)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
