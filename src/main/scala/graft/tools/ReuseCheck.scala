package graft.tools

import graft.{SparkEntry, Tables}

/** Dev tool: execute gate queries and report parquet-scan and
  * exchange-reuse counts from the FINAL adaptive plan — static explain
  * hides AQE stage reuse, so `ExplainAll` alone under-reports subtree
  * sharing. `runMain graft.tools.ReuseCheck <queryName...>`
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = Tables.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val reuse =
        "ReusedExchange|ReusedQueryStage|ShuffleQueryStage|BroadcastQueryStage".r
          .findAllIn(s).toList.groupBy(identity).view.mapValues(_.size).toMap
      println(s"$n SCANS=${"Scan parquet".r.findAllIn(s).length} REUSE=$reuse")
    }
    spark.stop()
  }
}
