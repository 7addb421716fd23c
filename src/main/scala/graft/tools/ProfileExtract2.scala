package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Variant probe: where does post-shuffle parallelism go? */
object ProfileExtract2 {
  def main(args: Array[String]): Unit = {
    val n = 24000
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
      println(f"$label%-34s rows=$c%8d sec=$sec%7.2f rows/s=${c / sec}%9.1f")
    }

    // partition utilization of the full pipeline
    val ext = graft.extract.Pipeline.extract(spark, pages(), 128)
    val parts = ext.rdd.mapPartitions(it => Iterator(it.size)).collect()
    println(s"post-shuffle partitions=${parts.length} nonEmpty=${parts.count(_ > 0)} " +
      s"max=${parts.max} min=${parts.min}")

    time("full (warm)")(graft.extract.Pipeline.extract(spark, pages(), 128).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("full AQE off")(graft.extract.Pipeline.extract(spark, pages(), 128).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
