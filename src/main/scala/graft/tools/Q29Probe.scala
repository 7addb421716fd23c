package graft.tools
import org.apache.spark.sql.SparkSession
object Q29Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("q29probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.ops.Ops.q29Simhash64Pairs(spark, dir).count() // warm
    val ts = (1 to 4).map { _ =>
      val t0 = System.nanoTime()
      graft.ops.Ops.q29Simhash64Pairs(spark, dir).count()
      (System.nanoTime()-t0)/1e9
    }
    println(f"q29 runs: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    val df = graft.ops.Ops.q29Simhash64Pairs(spark, dir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
