package graft.tools
import org.apache.spark.sql.SparkSession
object Q25Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("q25probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.ops.Ops.q25NgramJaccardPruned(spark, dir).count()
    graft.ops.Ops.q25NgramJaccardPruned(spark, dir).count()
    val ts = (1 to 6).map { _ =>
      val t0 = System.nanoTime()
      graft.ops.Ops.q25NgramJaccardPruned(spark, dir).count()
      (System.nanoTime()-t0)/1e9
    }
    println(f"q25 runs: ${ts.map(t => f"$t%.2f").mkString(" ")} median=${ts.sorted.apply(3)}%.2f")
    spark.stop()
  }
}
