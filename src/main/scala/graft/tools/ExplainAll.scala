package graft.tools

import graft.{SparkEntry, Tables}

/** Dev tool: dump formatted physical plans for selected queries so plan
  * regressions (lost pushdown, missed broadcast, codegen breaks) are
  * visible. `runMain graft.tools.ExplainAll [queryName...]`
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = Tables.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q02_filter_pushdown", "q03_top_orders",
        "q04_broadcast_join", "q05_region_revenue", "x01_token_stats")
    names.foreach { n =>
      println(s"\n================ $n ================")
      try println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Exception => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
