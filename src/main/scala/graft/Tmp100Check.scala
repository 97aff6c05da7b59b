package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Tmp100Check {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries("q_dedup_semantic")(spark, "/tmp/sfbig100")
    val t0 = System.nanoTime()
    df.agg(sum(col("n_dups")), sum(when(!col("keep"), 1L).otherwise(0L))).show()
    println(f"took ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
