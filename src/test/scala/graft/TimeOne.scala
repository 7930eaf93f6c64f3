package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.sources.ParquetTables.registerAll(spark, dir).foreach(t => spark.table(t).count())
    for (name <- args) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        // Full materialization (Bench's noop-sink pricing) — count()
        // would let Catalyst prune agg lists (SURVEY §8.9.1).
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name pass$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
