import graft.model._
import graft.extract.DocTransforms
import java.util.Base64
object TableDiff { def main(a: Array[String]): Unit = {
  def dec(s: String) = new String(Base64.getDecoder.decode(s), "UTF-8")
  def parseCells(s: String): Array[TableCell] =
    if (s.isEmpty) Array.empty
    else s.split(";", -1).filter(_.nonEmpty).map { cs =>
      val p = cs.split(",", 5)
      val text = if (p.length > 4) dec(p(4)) else ""
      TableCell(p(0).toInt, p(1).toInt, p(2).toInt, p(3).toInt,
        p(1).toInt - p(0).toInt, p(3).toInt - p(2).toInt, text,
        columnHeader = p(0).toInt == 0, rowHeader = false, rowSection = false,
        fillable = false, bbox = None)
    }
  var total = 0; var bad = 0
  for (line <- scala.io.Source.fromFile("/tmp/difftest/table_golden.tsv", "UTF-8").getLines()) {
    total += 1
    val f = line.split("\t", -1)
    val table = TableData(f(0).toInt, f(1).toInt, parseCells(f(2)))
    val expCollapsed = f(3) == "1"
    val expCurChanged = f(4).toInt
    val expNcols = f(5).toInt
    val expCells = parseCells(f(6)).map(c => (c.startRow, c.endRow, c.startCol, c.endCol, c.text)).toList
    // mirror reference order: collapse then currency, in place
    val afterCollapse = DocTransforms.collapseTableHeaderGroups(table)
    val collapsed = afterCollapse.nonEmpty
    val t1 = afterCollapse.getOrElse(table)
    val (t2, curChanged) = DocTransforms.normalizeTableCurrencyColumns(t1)
    val gotCells = t2.cells.map(c => (c.startRow, c.endRow, c.startCol, c.endCol, c.text)).toList
    if (collapsed != expCollapsed || curChanged != expCurChanged ||
        t2.numCols != expNcols || gotCells != expCells) {
      bad += 1
      if (bad <= 5) {
        println(s"MISMATCH case=$total collapsed=$collapsed/$expCollapsed cur=$curChanged/$expCurChanged ncols=${t2.numCols}/$expNcols")
        println("  got:  " + gotCells.take(8))
        println("  want: " + expCells.take(8))
      }
    }
  }
  println(s"checked $total tables, failures: $bad")
}}
