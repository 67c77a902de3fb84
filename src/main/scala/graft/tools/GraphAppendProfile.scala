package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the C56 O(batch) evidence line — wall-clock of the APPEND
  * step (persisted base graph + the two batch probe legs + merge rank)
  * vs a FULL REBUILD over the merged corpus, both over the same merged
  * frozen-codebook index, min-of-N with a warm first pass (stores and
  * models built untimed, the Bench discipline). Run:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.GraphAppendProfile"
  */
object GraphAppendProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = graft.GraftConf(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // warm pass: merged index, corpus codebook, base graph store all land
    // here so the timed numbers compare the two EDGE computations alone
    noop(graft.operators.Similarity.knnGraphAppendEdges(spark, sfDir))
    noop(graft.operators.Similarity.knnGraphRebuildEdges(spark, sfDir))
    def timeMin(label: String)(body: => Unit): Unit = {
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"step":"$label","min_sec":$t%.3f,"sf":"$sfDir"}""")
    }
    timeMin("append_step")(
      noop(graft.operators.Similarity.knnGraphAppendEdges(spark, sfDir)))
    timeMin("full_rebuild")(
      noop(graft.operators.Similarity.knnGraphRebuildEdges(spark, sfDir)))
    // the O(batch) contract is per leg — split the append so the evidence
    // names what scales with the batch (both legs) vs what is shared with
    // the rebuild (the global merge rank over slim shortlist rows)
    timeMin("leg_new_queries")(
      noop(graft.operators.Similarity.knnGraphAppendLegNew(spark, sfDir)))
    timeMin("leg_reverse")(
      noop(graft.operators.Similarity.knnGraphAppendLegReverse(spark, sfDir)))
    spark.stop()
  }
}
