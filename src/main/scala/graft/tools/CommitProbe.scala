package graft.tools

import graft.sources.DeltaLite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics: where does one DeltaLite commit lifecycle spend
  * its time at bench scale? Times create / append / merge / read on the
  * sf0.1 orders frame. Not part of the driver contract. */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val j0 = jobs.get()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s jobs=${jobs.get() - j0}")
      r
    }
    val o = graft.Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // warm the scan + shuffle machinery
    o.count(); o.count()
    (1 to 3).foreach { i =>
      val path = graft.TempDirs.fresh(s"probe$i")
      val target = o.filter(col("o_orderkey") % 3 === 0)
      time(s"create#$i") { DeltaLite.create(spark, path, target) }
      val batch = o.filter(col("o_orderkey") % 7 === 0)
      time(s"append#$i") { DeltaLite.append(spark, path, batch) }
      time(s"read+count#$i") { DeltaLite.read(spark, path).count() }
      time(s"read2+count#$i") { DeltaLite.read(spark, path).count() }
    }
    spark.stop()
  }
}
