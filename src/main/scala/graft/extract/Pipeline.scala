package graft.extract

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end extraction pipeline as Catalyst-planned stages
  * (SURVEY.md §3.1 Spark lifecycle):
  *
  *   pages scan (url/html/lang pruned at the reader) -> bucket column
  *   (xxhash64(url) mod B, computed relationally so resume filters prune
  *   BEFORE the expensive parse) -> repartition on bucket -> mapPartitions
  *   parse (batched HTML tokenizer) -> typed doc-transform pass (pure
  *   item-array rewrites, reference order) -> markdown render + post-chain
  *   -> bucketed write with lineage commit.
  *
  * Shuffle surface: exactly one exchange (the bucket repartition, which is
  * also the resume/lineage partition). All transforms are row-local; giant
  * documents cost per-row only, and AQE remains free to coalesce the write.
  */
object Pipeline {
  val DefaultBuckets = 64

  case class ExtractedRow(
      url: String,
      bucket: Int,
      markdown: String,
      text: String,
      lang: String,
      page_count: Int,
      item_count: Int,
      table_count: Int,
      changed_cells: Int,
      removed_items: Int,
      md_chars: Long,
      html_bytes: Long)

  /** Parse + transform + render one document. Pure; called per row inside
    * mapPartitions. */
  private def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' &&
      bytes(3) == 'F' && bytes(4) == '-'

  def extractOne(url: String, htmlBytes: Array[Byte], lang: String,
                 bucket: Int): ExtractedRow = {
    val parsed =
      if (isPdf(htmlBytes)) PdfLayout.buildDoc(url, htmlBytes)
      else HtmlExtract.parse(url, new String(htmlBytes, java.nio.charset.StandardCharsets.UTF_8))
    val (doc, counters) = DocTransforms.applyAll(parsed)
    val md = MarkdownRender.postProcess(MarkdownRender.render(doc))
    val text = MarkdownRender.renderPlainText(doc)
    ExtractedRow(
      url = url,
      bucket = bucket,
      markdown = md,
      text = text,
      lang = lang,
      page_count = doc.pages.length,
      item_count = doc.items.length,
      table_count = doc.items.count(_.table.nonEmpty),
      changed_cells = counters.getOrElse("cleaned_cells", 0) +
        counters.getOrElse("normalized_headers", 0) +
        counters.getOrElse("normalized_currencies", 0),
      removed_items = counters.getOrElse("removed_dates", 0) +
        counters.getOrElse("removed_axis_text", 0),
      md_chars = md.length.toLong,
      html_bytes = htmlBytes.length.toLong)
  }

  /** Input projection + bucket assignment (codegen'd xxhash64, no UDF). */
  def withBucket(pages: DataFrame, numBuckets: Int): DataFrame =
    pages.select(col("url"), col("html"), col("lang"),
      pmod(xxhash64(col("url")), lit(numBuckets)).cast("int").as("bucket"))

  /** Full extraction over a pages DataFrame (url, warc_ts, html, text, lang).
    * `skipBuckets` prunes already-committed buckets before the parse stage. */
  /** `shuffle = true` co-locates each bucket in one task before the parse so
    * the bucketed write emits one file per bucket (the production layout for
    * partition-granular resume at 100TB). `shuffle = false` fuses the parse
    * into the scan stage — zero exchanges — for pure-throughput paths where
    * write layout doesn't matter (each task then writes to several bucket
    * dirs; compaction happens at commit). */
  def extract(spark: SparkSession, pages: DataFrame,
              numBuckets: Int = DefaultBuckets,
              skipBuckets: Set[Int] = Set.empty,
              shuffle: Boolean = true): Dataset[ExtractedRow] = {
    import spark.implicits._
    val bucketed = withBucket(pages, numBuckets)
    val pruned =
      if (skipBuckets.isEmpty) bucketed
      else bucketed.filter(!$"bucket".isin(skipBuckets.toSeq: _*))
    val placed = if (shuffle) pruned.repartition(numBuckets, $"bucket") else pruned
    placed
      .as[(String, Array[Byte], String, Int)]
      .mapPartitions { it =>
        // batched per-partition loop: compiled regex/state lives in JVM-static
        // textkit objects, so per-row cost is parse + transforms only
        it.map { case (url, html, lang, bucket) => extractOne(url, html, lang, bucket) }
      }
  }

  /** Extraction + resumable bucketed write with a lineage manifest.
    * Returns (snapshotId, total docs committed in this run). */
  def extractAndCommit(spark: SparkSession, pages: DataFrame, outDir: String,
                       numBuckets: Int = DefaultBuckets): (String, Long) = {
    import spark.implicits._
    val done = graft.lineage.Lineage.committedBuckets(outDir)
    val t0 = System.nanoTime()
    val extracted = extract(spark, pages, numBuckets, skipBuckets = done)
    extracted.toDF()
      .write.mode("append").partitionBy("bucket").parquet(s"$outDir/data")
    val elapsedMs = (System.nanoTime() - t0) / 1000000

    val stats = spark.read.parquet(s"$outDir/data")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("doc_count"), sum($"md_chars").as("bytes"))
      .as[(Int, Long, Long)].collect()

    val newDocs = stats.filterNot(s => done.contains(s._1)).map(_._2).sum
    val snapshotId = graft.lineage.Lineage.commit(outDir, numBuckets,
      stats.sortBy(_._1).map { case (b, n, bytes) =>
        graft.lineage.Lineage.PartitionStat(b, n, bytes, elapsedMs)
      },
      inputDesc = pages.schema.map(_.name).mkString(","))
    (snapshotId, newDocs)
  }
}
