package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B ivfTopK with the ranked cache+checkpoint vs fully lazy. */
object Q27Ab {
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
    val codebook = graft.ops.Ops.ivfCodebook(16)

    def ranked0: DataFrame = {
      val v = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", sqrt(graft.functions.VecMath.dotProduct(col("v"), col("v"))))
      val cellDists = array(codebook.indices.map { c =>
        struct(graft.functions.VecMath.sqDist(col("v"),
            typedLit(codebook(c).toIndexedSeq)).as("dist"),
          lit(c).as("cell"))
      }: _*)
      v.withColumn("sorted", array_sort(cellDists))
        .select(col("vec_id"), col("v"), col("nrm"),
          col("sorted")(0)("cell").as("cell"),
          expr("transform(slice(sorted, 1, 2), x -> x.cell)").as("probe_cells"))
        .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
    }

    def tail(ranked: DataFrame): DataFrame = {
      val assigned = ranked.select(col("vec_id"), col("cell"), col("v"), col("nrm"))
      val probes = ranked.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"), explode(col("probe_cells")).as("cell"))
      val pairs = probes.join(assigned, "cell")
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          round(graft.functions.VecMath.dotProduct(col("qv"), col("v")) /
            (col("qnrm") * col("nrm")), 4).as("sim"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
      pairs.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id").as("vec_id"), col("neighbor_id"), col("sim"), col("rank"))
        .orderBy(col("vec_id"), col("rank"))
    }

    def cached(): Long = {
      val r = ranked0.cache()
      val out = tail(r).localCheckpoint()
      r.unpersist()
      out.count()
    }
    def lazyShape(): Long = tail(ranked0).count()

    def time(label: String)(f: => Long): Unit = {
      f
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
