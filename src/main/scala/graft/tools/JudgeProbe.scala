package graft.tools

/** Debug utility: run named gate queries on a sf dir and print a row
  * count + sample. Unknown names fail with the valid-name list; the
  * session always stops, even when a probe throws.
  */
object JudgeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.sessionBuilder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    try args.foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          val df = fn(spark, dir)
          println(s"PROBE $n rows=" + df.count())
          df.show(5, false)
        case None =>
          System.err.println(s"unknown gate '$n'; valid names:\n  " +
            graft.SparkEntry.queries.keys.toSeq.sorted.mkString("\n  "))
      }
    } finally spark.stop()
  }
}
