package graft.tools

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot generator for the pinned IVF coarse-quantizer centroids in
  * [[graft.queries.IvfOracle]]: fits the SAME KMeans the online tier
  * ([[graft.operators.Similarity.ivfTopK]]) uses (k=16, seed=42,
  * maxIter=5, random init) on the sf0.01 gate fixture, unit-normalizes
  * the centers, and prints them as a Scala literal to paste. Run:
  *
  *   sbt "Test/runMain graft.tools.PinIvfCentroids /root/testdata/sf0.01"
  *
  * The pinned values are a build-time artifact, not runtime state — the
  * production IVF layout trains its quantizer offline and freezes it,
  * which is exactly what pinning models.
  */
object PinIvfCentroids {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), array_to_vector(col("embedding")).as("fvec"))
    val km = new KMeans().setK(16).setSeed(42L).setFeaturesCol("fvec")
      .setPredictionCol("cell").setMaxIter(5).setInitMode("random")
    val model = km.fit(emb)
    val out = model.clusterCenters.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(_ / n)
    }
    println("  val pinnedCentroids: Array[Array[Double]] = Array(")
    out.foreach { c =>
      println("    Array(" + c.map(java.lang.Double.toString).mkString(", ") + "),")
    }
    println("  )")
    spark.stop()
  }
}
