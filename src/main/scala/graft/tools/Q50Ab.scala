package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PolyHash.polyhash

/** A/B the q50 shapes in one session: freq-join-back vs window-over-one-exchange. */
object Q50Ab {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def paras: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast(ceil(size(w)/12.0) as int)-1)," +
          " i -> concat_ws(' ', slice(w, i*12+1, 12)))")).as("para"))
      .select(col("doc_id"), polyhash(col("para")).as("h"))

    def tail(withOcc: DataFrame): DataFrame = withOcc
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_paras"),
        sum(when(col("n_occ") > 1, 1).otherwise(0)).as("n_dup_paras"))
      .withColumn("dup_ratio",
        round(col("n_dup_paras").cast("double") / col("n_paras"), 6))
      .orderBy(col("doc_id"))

    def joinShape(): DataFrame = {
      val p = paras
      tail(p.join(p.groupBy(col("h")).agg(count(lit(1)).as("n_occ")), "h"))
    }
    def windowShape(): DataFrame =
      tail(paras.withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("h")))))

    def time(label: String)(f: => DataFrame): Unit = {
      f.count() // warm
      val t0 = System.nanoTime(); f.count()
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f.count()
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"$label best=${math.min(s1, s2)}%6.3f ($s1%5.3f/$s2%5.3f)")
    }
    for (_ <- 0 until 2) {
      time("join-back ")(joinShape())
      time("window    ")(windowShape())
    }
    spark.stop()
  }
}
