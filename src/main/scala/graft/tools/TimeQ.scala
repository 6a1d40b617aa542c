package graft.tools
import graft.{SparkEntry, Tables}
// Dev tool: time selected queries twice in a warm session.
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = Tables.sessionBuilder("local[16]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        println(f"$n run$run: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
