package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: native pcap scan throughput on a large capture. */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val file = args.headOption.getOrElse("/tmp/big.pcap")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new java.io.File(file).length / 1e6
    for ((label, df) <- Seq(
      "count 5-col" -> spark.read.format("pcap").load(file),
      "count 4-col (info pruned)" -> spark.read.format("pcap").load(file)
        .select(col("`frame.number`"), col("`frame.time_epoch`"),
          col("`frame.protocols`"), col("`frame.len`")),
      "count pruned(frame.len)" -> spark.read.format("pcap").load(file).select(col("`frame.len`")),
      "agg ip+tcp ports" -> spark.read.format("pcap").option("protocols", "ip,tcp").load(file)
        .groupBy(col("`tcp.srcport`")).agg(sum(col("`tcp.len`"))),
      "split 16m agg frame.len" -> spark.read.format("pcap").option("split", "16m").load(file)
        .agg(sum(col("`frame.len`"))))) {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"SCAN $label run$i: $s%.2f s  ${bytes / s}%.0f MB/s")
      }
    }
    // planning cost: driver header sweep vs executor-parallel resync —
    // the sweep grows with file size, resync stays O(1) driver I/O
    for (mode <- Seq("index", "resync"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = spark.read.format("pcap").option("split", "16m")
        .option("split.mode", mode).load(file).rdd.getNumPartitions
      println(f"PLAN split.mode=$mode run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n partitions)")
    }
    spark.stop()
  }
}
