package graft.tools

import org.apache.spark.sql.SparkSession

/** CLI entry: run the extraction pipeline over the synthetic pages table and
  * commit to a lineage-tracked output dir.
  *
  * Usage: sbt "runMain graft.tools.RunExtract <nDocs> <outDir> [numBuckets]"
  * Env: SPARK_GRAFT_CPUS (local[N], default 8)
  */
object RunExtract {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_extract_out"
    val numBuckets = if (args.length > 2) args(2).toInt else 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-extract")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val t0 = System.nanoTime()
    val pages = spark.createDataset(spark.sparkContext
      .parallelize(0L until n.toLong, cpus.toInt * 2)
      .map(i => graft.sources.SyntheticPages.page(42L, i)))
      .toDF()
    val (snapshotId, committed) = graft.extract.Pipeline.extractAndCommit(
      spark, pages, outDir, numBuckets)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"snapshot=$snapshotId committed=$committed docs in $sec%.2f s " +
      f"(${committed / math.max(sec, 1e-9)}%.1f docs/s) -> $outDir")
    spark.stop()
  }
}
