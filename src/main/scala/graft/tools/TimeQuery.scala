package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time one SparkEntry query (warm + 2 timed passes).
  * Usage: runMain graft.tools.TimeQuery <queryName> [sfDir] [cpus] */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "32"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    def once(): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    once() // warm
    val (n1, s1) = once()
    val (_, s2) = once()
    println(f"timed $name rows=$n1 pass1=$s1%.3f pass2=$s2%.3f")
    spark.stop()
  }
}
