package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print q44's row so the oracle VALUES literal can be pinned. */
object Q44Values {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.ExtractOps.referenceGolden(spark, "/root/testdata/sf0.001")
      .collect().foreach(println)
    spark.stop()
  }
}
