package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q66Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .appName("q66probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val gap = 30
    val base = java.nio.file.Files.createTempDirectory("q66probe").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$base/src"))
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
      .select($"event_id", $"user_id", $"ts", $"value").cache()
    val mid = ev.agg(expr("percentile_approx(cast(ts as double), 0.5)")).collect()(0).getDouble(0)
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/tmp-$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmp))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, java.nio.file.Paths.get(s"$base/src/$name.parquet"))
      Thread.sleep(5)
    }
    writeOne(ev.filter($"ts".cast("double") <= mid), "f0")
    writeOne(ev.filter($"ts".cast("double") > mid), "f1")
    val sent = ev.groupBy($"user_id")
      .agg((max($"ts".cast("double")) + 864000).cast("timestamp").as("ts"))
      .select(lit(-1L).as("event_id"), $"user_id", $"ts", lit(0.0).as("value"))
    writeOne(sent, "f2")
    val q = graft.streaming.Sessionize.stream(spark, s"$base/src", s"$base/out", s"$base/chk", gap)
    q.awaitTermination()
    val streamed = spark.read.parquet(s"$base/out")
    val batch = graft.streaming.Sessionize.batchSessions(ev, gap)
    println(s"batch sessions: ${batch.count()}  streamed: ${streamed.count()}")
    println("-- batch sample (user 0):")
    batch.filter($"user_id" === 0).orderBy($"session_start").show(8, false)
    println("-- streamed sample (user 0):")
    streamed.filter($"user_id" === 0).orderBy($"session_start").show(8, false)
  }
}
