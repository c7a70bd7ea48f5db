package graft.compat

import graft.SparkTestBase

/** Run a single grntest fixture and print full per-select outcomes.
  * sbt "Test/runMain graft.compat.RunOne select/filter/near/index_key"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val suite = "/root/reference/test/command/suite"
    val spark = SparkTestBase.spark
    args.foreach { fx =>
      println(s"========= $fx")
      try {
        GrnTestRunner.run(spark, s"$suite/$fx.test", s"$suite/$fx.expected")
          .foreach { o =>
            println((if (o.ok) "OK  " else "FAIL") + s" ${o.detail.take(2000)}")
          }
      } catch { case e: Throwable =>
        println(s"RUNERR ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
