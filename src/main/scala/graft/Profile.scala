package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalConf(SparkSession.builder().master("local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, dir, "embeddings")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-34s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    time("count")(e.count())
    time("norms")(e.select(Similarity.l2Norm(col("embedding")).as("n")).agg(sum("n")).count())
    time("signature")(e.select(Similarity.hyperplaneSignature(col("embedding"), 64, 32).as("s")).agg(sum("s")).count())
    time("sig+norm")(e.select(Similarity.l2Norm(col("embedding")).as("n"),
      Similarity.hyperplaneSignature(col("embedding"), 64, 32).as("s")).agg(sum("s")).count())
    val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("embedding"))
    val c = e.select(col("vec_id").as("cid"), col("embedding"))
    time("annTopK full")(Similarity.annTopK(q, c, "qid", "embedding", "cid", "embedding", 64, 3, 32, 8).count())
    time("dot-pairs 2M")(e.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(broadcast(e.filter(col("vec_id") < 100).select(col("vec_id").as("ib"), col("embedding").as("vb"))))
      .select(Similarity.dot(col("va"), col("vb")).as("d")).agg(sum("d")).count())
    spark.stop()
  }
}
