package graft.tools

object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.sessionBuilder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      println(s"PROBE $n rows=" + df.count())
      df.show(5, false)
    }
    spark.stop()
  }
}
