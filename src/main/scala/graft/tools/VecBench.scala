package graft.tools
import graft.{Tables}
import graft.ext.Similarity
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
object VecBench {
  def main(args: Array[String]): Unit = {
    val spark = Tables.sessionBuilder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, "/root/testdata/sf0.1", "embeddings") // 2000 x 64
    val a = e.alias("a"); val b = e.alias("b")
    val pairs = a.join(b, col("a.vec_id") =!= col("b.vec_id")) // ~4M pairs
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(s"$name: ${(System.nanoTime()-t0)/1e9}%.2f".replace("%.2f","") + "s")
    }
    // warmup
    pairs.select(count(lit(1))).collect()
    time("composed-HOF cosine") {
      pairs.select(sum(Similarity.cosine(col("a.embedding"), col("b.embedding")))).collect()
    }
    time("native codegen cosine") {
      pairs.select(sum(VectorFunctions.vector_cosine(col("a.embedding"), col("b.embedding")))).collect()
    }
    spark.stop()
  }
}
