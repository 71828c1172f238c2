package graft

import org.apache.spark.sql.SparkSession

/** Reproduces the frozen PCA literals used by the `emb_pca_project`
  * query: trains [[graft.ops.SimilarityOps.pcaModel]] on the given sf
  * dir's embeddings and prints mean / top-2 components / eigenvalues as
  * copy-pasteable full-precision doubles. Production contract: a PCA is
  * trained ONCE and applied to every snapshot thereafter (the frozen-
  * tokenizer discipline), which is also what lets the DuckDB oracle
  * replay the projection with the identical literals.
  *
  * Usage: runMain graft.FreezePca /root/testdata/sf0.01
  */
object FreezePca {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (mean, eig, rot) =
      ops.SimilarityOps.pcaModel(spark.read.parquet(s"$dir/embeddings.parquet"))
    println("MEAN=" + mean.mkString(","))
    println("EV0=" + rot(0).mkString(","))
    println("EV1=" + rot(1).mkString(","))
    println("EIG=" + eig.take(4).mkString(","))
    spark.stop()
  }
}
