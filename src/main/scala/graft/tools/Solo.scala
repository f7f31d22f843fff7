package graft.tools
import org.apache.spark.sql.SparkSession
object Solo {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("a1_groupby_aggs")(spark, sfDir).count()
    args.drop(1).foreach { q =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"SOLO $q ${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"SOLO-2nd $q ${(System.nanoTime()-t1)/1e9}%.2f s")
    }
    spark.stop()
  }
}
