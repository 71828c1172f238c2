package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** Measure ANN recall vs brute force across the tuning grid — the source
  * of docs/ANN_TUNING.md's sizing table. A user picks (bands, rowsPerBand)
  * or (nCentroids, nprobe) for a target recall from measured numbers
  * instead of reading test code.
  *
  * Hyperplane-LSH theory anchor: two vectors at angle θ agree on one
  * signature bit with p = 1 - θ/π, so a query collides with a neighbor in
  * at least one of b bands of r bits with P = 1 - (1 - p^r)^b. More bands
  * → higher recall & more candidates; more rows/band → sharper filter.
  * IVF: nprobe/nCentroids is the fraction of space searched.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).cache()
    val nCorpus = emb.count()
    val q = emb.filter($"vec_id" < 50)
    val k = 10
    val brute = SimilarityOps.bruteForceTopK(q, emb, k).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(pairs: Set[(Long, Long)]): Double =
      math.rint(1000.0 * (brute & pairs).size / brute.size) / 1000.0
    println(s"corpus=$nCorpus queries=50 k=$k (sf=$sfDir)")
    println("| lsh bands | rows/band | recall@10 |")
    for (bands <- Seq(8, 16, 32); rpb <- Seq(4, 8)) {
      val ann = SimilarityOps.annTopK(q, emb, dim = 64, k = k,
        bands = bands, rowsPerBand = rpb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"| $bands | $rpb | ${recallOf(ann)} |")
    }
    println("| ivf nCentroids | nprobe | recall@10 |")
    for (nc <- Seq(16, 64); np <- Seq(1, 2, 4, 8, 16) if np <= nc) {
      val ivf = SimilarityOps.ivfTopK(q, emb, dim = 64, k = k,
        nCentroids = nc, nprobe = np).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"| $nc | $np | ${recallOf(ivf)} |")
    }
    spark.stop()
  }
}
