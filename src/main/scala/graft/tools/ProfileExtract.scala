package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling of the extraction pipeline (generation-only vs
  * +shuffle vs full) to locate overhead. */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 24000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def pages() = spark.createDataset(spark.sparkContext
      .parallelize(0L until n.toLong, 128)
      .map(i => graft.sources.SyntheticPages.page(42L, i))).toDF()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s rows=$c%8d  sec=$sec%7.2f  rows/s=${c / sec}%9.1f")
    }

    // warm-up all paths
    time("warmup-full")(graft.extract.Pipeline.extract(spark, pages(), 128).count())

    time("gen-only (rdd count)")(spark.sparkContext
      .parallelize(0L until n.toLong, 128)
      .map(i => graft.sources.SyntheticPages.page(42L, i)).count())
    time("gen+encode (ds count)")(pages().count())
    time("gen+shuffle")(
      graft.extract.Pipeline.withBucket(pages(), 128).repartition(128, $"bucket").count())
    time("gen+extract-no-shuffle") {
      val p = graft.extract.Pipeline.withBucket(pages(), 128)
        .as[(String, Array[Byte], String, Int)]
      p.mapPartitions(_.map { case (u, h, l, b) =>
        graft.extract.Pipeline.extractOne(u, h, l, b) }).count()
    }
    time("full pipeline")(graft.extract.Pipeline.extract(spark, pages(), 128).count())
    spark.stop()
  }
}
