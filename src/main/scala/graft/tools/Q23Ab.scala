package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B q23 with and without the cache + release-checkpoint tail. */
object Q23Ab {
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

    def vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VecMath.dotProduct(col("v"), col("v"))))

    def sigCols = (0 until 6).map { p =>
      val plane = (0 until 64).map { i =>
        ((1103515245L * (p * 64 + i + 1) + 12345L) % 1024 - 512).toDouble
      }
      val dot = graft.functions.VecMath.dotProduct(col("v"), typedLit(plane))
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

    def tail(bucketed: DataFrame): DataFrame = {
      val pairs = bucketed.as("x").join(bucketed.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("neighbor_id"),
          round(graft.functions.VecMath.dotProduct(col("x.v"), col("y.v")) /
            (col("x.nrm") * col("y.nrm")), 4).as("sim"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy(col("vec_id"), col("rank"))
    }

    def cached(): Long = {
      val b = vecs.withColumn("bucket", sigCols).cache()
      val out = tail(b).localCheckpoint()
      b.unpersist()
      out.count()
    }
    def lazyShape(): Long = tail(vecs.withColumn("bucket", sigCols)).count()

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"$label best=${math.min(s1, s2)}%6.3f ($s1%5.3f/$s2%5.3f)")
    }
    for (_ <- 0 until 2) {
      time("cached+ckpt")(cached())
      time("lazy       ")(lazyShape())
    }
    spark.stop()
  }
}
