package graft
class DebugBpeSpec extends SparkSpec {
  test("bpe train small") {
    val t0 = System.nanoTime
    val rows = graft.queries.TextQueries.txBpeTrain.fn(spark, "/root/testdata/sf0.001").collect()
    println(s"BPETIME ${(System.nanoTime - t0) / 1e9}s")
    rows.foreach(r => println("BPE " + r))
  }
}
