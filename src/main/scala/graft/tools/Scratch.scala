package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Throwaway measurement harness for the optimization round: times
  * labeled sub-pipelines of a hot query through the noop sink so the
  * cost can be attributed operator by operator (guide §1). Not part of
  * the harness surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.HarnessSession.fromEnv(default = "32")
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      // warm-up then 2 timed
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      graft.SessionHygiene.reset(spark)
      println(f"SCRATCH $label%-40s cold=${ts.head}%6.2f warm=${ts.tail.map(t => f"$t%.2f").mkString(",")}")
    }

    val em = Tables.embeddings(spark, sfDir)

    // lshKnnGraph decomposition (q134/q132/q140/q216 prefix)
    time("scan only") { em.select(col("vec_id")) }
    time("norm only") {
      em.select(col("vec_id"),
        sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("n"))
    }
    val mi = classOf[Similarity.type].getDeclaredMethods
      .find(_.getName == "signSketchTable").get
    mi.setAccessible(true)
    def sketch(): DataFrame =
      mi.invoke(Similarity, em, "vec_id", "id", "embedding",
        Int.box(24), Int.box(64), Long.box(42L)).asInstanceOf[DataFrame]
    time("signSketchTable 24bit") { sketch() }
    // unrolled: 24 explicit dot() calls summed, no zip_with wrapper
    time("sketch unrolled 24bit") {
      val s = (0 until 24).map { h =>
        val hp = typedLit(Similarity.hyperplaneValues(h, 64, 42L))
        when(Similarity.dot(col("embedding"), hp) > lit(0.0),
          lit(1L << (23 - h))).otherwise(lit(0L))
      }.reduce(_ + _)
      em.select(col("vec_id"), s.as("__sk"))
    }
    // plain-double dots only (lower bound if decimal were free)
    time("sketch plaindot 24bit") {
      val s = (0 until 24).map { h =>
        val hp = typedLit(Similarity.hyperplaneValues(h, 64, 42L))
        when(Similarity.dotDouble(col("embedding"), hp) > lit(0.0),
          lit(1L << (23 - h))).otherwise(lit(0L))
      }.reduce(_ + _)
      em.select(col("vec_id"), s.as("__sk"))
    }
    time("knnGraph full") {
      Similarity.lshKnnGraph(em, "vec_id", "embedding",
        k = 3, numBits = 24, bands = 3)
    }
    spark.stop()
  }
}
