package graft.tools

import org.apache.spark.sql.SparkSession

/** 8->32 scaling A/B over shuffle variants (round-4 verdict task 1).
  *
  * Each variant runs the full extraction (with its exchange shape) at
  * local[8] and local[32] on the SAME pre-written parquet corpus, warm per
  * level, then 3 interleaved pairs -> median efficiency. Variants:
  *   base       input-shuffle (round-3 default), default local dir
  *   shm        input-shuffle, shuffle files on /dev/shm (tmpfs)
  *   buf        input-shuffle, 1m shuffle file buffer + 512k lz4 blocks
  *   shmbuf     both
  *   post       shuffle AFTER parse (exchange carries parsed rows)
  *   postshm    post + tmpfs
  *
  * Usage: runMain graft.tools.ScalingAb [docs] [variant,variant,...]
  */
object ScalingAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 96000
    val variants =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("base", "shm", "buf", "shmbuf", "post", "postshm")

    // corpus written once by a bootstrap session
    val dir = java.nio.file.Files.createTempDirectory("graft-scaling-ab").toString
    locally {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      s.createDataset(s.sparkContext.parallelize(0L until n.toLong, 128)
        .map(i => graft.sources.SyntheticPages.page(42L, i))).toDF()
        .write.mode("overwrite").parquet(dir)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def runAt(cpus: Int, variant: String): Double = {
      val b = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "64k")
        .config("spark.ui.enabled", "false")
      if (variant.contains("shm"))
        b.config("spark.local.dir", "/dev/shm/graft-shuffle")
      if (variant == "buf" || variant == "shmbuf") {
        b.config("spark.shuffle.file.buffer", "1m")
        b.config("spark.io.compression.lz4.blockSize", "512k")
      }
      if (variant.contains("nocomp"))
        b.config("spark.shuffle.compress", "false")
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      val df = s.read.parquet(dir)
      val afterParse = variant.startsWith("post")
      val buckets =
        if (variant.contains("1024")) 1024
        else if (variant.contains("512")) 512 else 128
      def one(): Long = graft.extract.Pipeline
        .extract(s, df, numBuckets = buckets, shuffleAfterParse = afterParse).count()
      System.gc()
      val t0 = System.nanoTime()
      val c = one()
      val sec = (System.nanoTime() - t0) / 1e9
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      c / sec
    }

    for (v <- variants) {
      runAt(8, v); runAt(32, v) // warm (untimed)
      val pairs = (0 until 3).map(_ => (runAt(8, v), runAt(32, v)))
      val effs = pairs.map { case (a, b) => (b / a) / 4.0 }.sorted
      val med = effs(effs.length / 2)
      val pj = pairs.map { case (a, b) => f"[${a}%.0f,${b}%.0f]" }.mkString(",")
      println(f"variant=$v%-8s median_eff=$med%.3f pairs=$pj")
    }
  }
}
