package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage isolation for q25 (noop sinks, guide §1.4): where do the seconds
  * go — the trigram explode, the bounded-distinct aggregate, or the pair
  * expansion? Plus variants: per-doc pre-dedup, raised ObjectHashAggregate
  * fallback threshold. */
object Q25Stages {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = spark.read.parquet(s"$dir/documents.parquet")
    def rawNg: DataFrame = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))")).as("ng"))
    def dedupNg: DataFrame = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(w)-3), i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"))).as("ng"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      val s1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); f
      val s2 = (System.nanoTime() - t1) / 1e9
      println(f"$label%-34s best=${math.min(s1, s2)}%6.2f s  ($s1%5.2f/$s2%5.2f)")
    }

    val bd = udaf(new graft.ops.BoundedDistinctIds(50))
    def aggOf(ng: DataFrame): DataFrame =
      ng.groupBy(col("ng")).agg(bd(col("doc_id")).as("bs"))
        .filter(!col("bs.overflow")).select(col("bs.ids").as("ids"))

    time("A raw explode (noop)")(noop(rawNg))
    time("B dedup explode (noop)")(noop(dedupNg))
    time("C agg over raw (noop)")(noop(aggOf(rawNg)))
    time("D agg over dedup (noop)")(noop(aggOf(dedupNg)))
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
    time("E agg raw, high fallback (noop)")(noop(aggOf(rawNg)))
    time("F agg dedup, high fallback (noop)")(noop(aggOf(dedupNg)))
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    time("G full q25")(graft.ops.Ops.q25NgramJaccardPruned(spark, dir).count(): Unit)

    // H: eager-checkpoint keptGroups, lazy tail (no out-checkpoint, no cache)
    def variantH(): Unit = {
      val kept = aggOf(rawNg).localCheckpoint()
      val sizes = kept.select(explode(col("ids")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
      val inter = kept
        .filter(size(col("ids")) >= 2)
        .select(sort_array(col("ids")).as("ids"))
        .select(explode(expr(
          "flatten(transform(sequence(0, size(ids)-2), " +
            "i -> transform(sequence(i+1, size(ids)-1), " +
            "j -> named_struct('id_a', ids[i], 'id_b', ids[j]))))")).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_ng", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_ng", "n_b"), "id_b")
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.08)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
      out.count(): Unit
    }
    time("H eager-kept, lazy tail")(variantH())

    // I: no cache at all — both tail branches re-reference the aggregate;
    // the agg's exchange is reused, only the final-merge step runs twice
    def variantI(): Unit = {
      val kept = aggOf(rawNg)
      val sizes = kept.select(explode(col("ids")).as("doc_id"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
      val inter = kept
        .filter(size(col("ids")) >= 2)
        .select(sort_array(col("ids")).as("ids"))
        .select(explode(expr(
          "flatten(transform(sequence(0, size(ids)-2), " +
            "i -> transform(sequence(i+1, size(ids)-1), " +
            "j -> named_struct('id_a', ids[i], 'id_b', ids[j]))))")).as("p"))
        .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
        .agg(count(lit(1)).as("n_inter"))
      val out = inter
        .join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_ng", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_ng", "n_b"), "id_b")
        .withColumn("jaccard", round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")), 6))
        .filter(col("jaccard") >= 0.08)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("id_a"), col("id_b"))
      out.count(): Unit
    }
    time("I no cache, reuse exchange")(variantI())
    spark.stop()
  }
}
