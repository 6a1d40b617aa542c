package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Scratch plan inspector: print a gate's executed plan AFTER running it
  * (AQE finalizes exchange reuse only at execution).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.Tables.sessionBuilder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      df.count()
      println(s"==== $name ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
