package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous extraction: the SAME per-row conversion flow the batch
  * pipeline runs, over a streaming file source of arriving page files —
  * the "crawl keeps landing" deployment shape. Each micro-batch goes
  * through foreachBatch into the bucketed layout, so the batch engine's
  * write path (and its lineage/commit discipline) is reused verbatim;
  * exactly-once across restarts comes from the checkpointed source offsets
  * plus the idempotent bucket-directory commit in Lineage.
  */
object StreamingExtract {
  /** Start a streaming extraction from `sourceDir` (parquet page files with
    * url/html/text/lang) appending extracted rows to `outDir/data`.
    * Trigger.AvailableNow drains what is present and stops — the batch-parity
    * test shape; a production deployment uses a processing-time trigger. */
  def stream(spark: SparkSession, sourceDir: String, outDir: String,
             checkpointDir: String, numBuckets: Int = 16): StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val pages = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(sourceDir)
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.extract.Pipeline.extract(spark, batch, numBuckets = numBuckets)
          .toDF()
          .write.mode("append").partitionBy("bucket").parquet(s"$outDir/data")
      }
      .start()
  }
}
