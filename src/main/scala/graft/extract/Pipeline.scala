package graft.extract

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

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

    // crash safety: a previous run may have written bucket files and died
    // before committing the manifest — those buckets will be re-extracted, so
    // their orphaned files must go first or append would duplicate rows
    val dataDir = java.nio.file.Paths.get(outDir, "data")
    if (java.nio.file.Files.exists(dataDir)) {
      val stream = java.nio.file.Files.list(dataDir)
      try {
        stream.iterator().asScala.foreach { p =>
          val name = p.getFileName.toString
          if (name.startsWith("bucket=")) {
            val b = name.stripPrefix("bucket=").toInt
            if (!done.contains(b)) {
              // uncommitted leftovers: remove recursively
              val walk = java.nio.file.Files.walk(p)
              try walk.sorted(java.util.Comparator.reverseOrder())
                .forEach(f => java.nio.file.Files.deleteIfExists(f))
              finally walk.close()
            }
          }
        }
      } finally stream.close()
    }

    val t0 = System.nanoTime()
    val extracted = extract(spark, pages, numBuckets, skipBuckets = done)
    // observed metrics ride the job (audit_utils fix-report counters analog,
    // SURVEY §2.4): no second pass, no accumulators to merge by hand
    val obs = org.apache.spark.sql.Observation(s"extract-commit")
    extracted.toDF()
      .observe(obs, count(lit(1)).as("docs"), sum($"changed_cells").as("changed_cells"),
        sum($"removed_items").as("removed_items"), sum($"md_chars").as("md_chars"))
      .write.mode("append").partitionBy("bucket").parquet(s"$outDir/data")
    val observed = obs.get
    val elapsedMs = (System.nanoTime() - t0) / 1000000

    // incremental stats: aggregate only the just-written buckets and merge
    // with the previous manifest (no full-history rescan at commit time)
    val prevStats: Map[Int, graft.lineage.Lineage.PartitionStat] =
      graft.lineage.Lineage.snapshots(outDir).lastOption
        .map(_._2.map(s => s.bucket -> s).toMap).getOrElse(Map.empty)
        .filter { case (b, _) => done.contains(b) }
    val newStats = spark.read.parquet(s"$outDir/data")
      .filter(!$"bucket".isin(done.toSeq: _*))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("doc_count"), sum($"md_chars").as("bytes"))
      .as[(Int, Long, Long)].collect()
      .map { case (b, n, bytes) => graft.lineage.Lineage.PartitionStat(b, n, bytes, elapsedMs) }

    val merged = (prevStats.values ++ newStats).toSeq.sortBy(_.bucket)
    val newDocs = newStats.map(_.docCount).sum
    val snapshotId = graft.lineage.Lineage.commit(outDir, numBuckets, merged,
      inputDesc = {
        // sum() over zero rows observes as null (key present) — normalize
        def met(k: String): Long =
          observed.get(k).flatMap(v => Option(v)).map(_.asInstanceOf[Number].longValue)
            .getOrElse(0L)
        pages.schema.map(_.name).mkString(",") +
          s"; observed: docs=${met("docs")} changed_cells=${met("changed_cells")}" +
          s" removed_items=${met("removed_items")}"
      })
    (snapshotId, newDocs)
  }
}
