package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries against a testdata dir.
  * Usage: sbt "runMain graft.tools.QueryTime <sfDir> <query> [query ...]"
  * Each query runs twice (cold, warm); both times print to stderr.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/graft-spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).collect().length
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      System.err.println(f"[qt] $n: cold ${times(0)._1}%.2fs warm ${times(1)._1}%.2fs rows=${times(0)._2}")
    }
    spark.stop()
  }
}
