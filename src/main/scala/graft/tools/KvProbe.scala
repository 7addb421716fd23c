package graft.tools
import java.nio.file.{Files, Paths}
object KvProbe {
  def main(args: Array[String]): Unit = {
    val pdf = Files.readAllBytes(Paths.get("/root/reference/examples/long_report.pdf"))
    val doc = graft.extract.PdfLayout.buildDoc("probe", pdf)
    val kvItems = doc.items.filter(_.kind == graft.model.ItemKind.KeyValue)
    println(s"KV items: ${kvItems.length} on pages ${kvItems.map(_.pageNo).distinct.sorted.mkString(",")}")
    for (it <- kvItems) {
      println(s"-- p${it.pageNo} (${it.kv.get.length} pairs)")
      for (p <- it.kv.get.take(4)) println(s"   [${p.key}] = [${p.value}]")
    }
    println(s"tables: ${doc.items.count(_.kind == graft.model.ItemKind.Table)}")
    // coverage check
    val row = graft.extract.Pipeline.extractOne("doc://long_report", pdf, "ro", 0)
    val want = Files.readString(Paths.get("/root/reference/examples/long_report.md"))
    val gotTokens = graft.textkit.Numbers.tokenize(row.markdown).toSet
    val wantTokens = graft.textkit.Numbers.tokenize(want)
    val cov = graft.textkit.Numbers.coverage(wantTokens, gotTokens)
    val wantNums = graft.textkit.Numbers.extractNumbers(want)
    val gotNums = graft.textkit.Numbers.extractNumbers(row.markdown)
    val recall = wantNums.count(gotNums.contains).toDouble / wantNums.size
    println(f"extractOne: tables=${row.table_count} coverage=$cov%.4f recall=$recall%.4f")
  }
}
