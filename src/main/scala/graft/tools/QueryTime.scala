package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftConf, SparkEntry}

/** Dev tool: time one named query N times (default 2) on a given sf dir. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      // noop sink: count() lets the optimizer prune aggregates/sorts and
      // understates cost by 10-30× — time the full materialization instead.
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"took ${(System.nanoTime() - t0) / 1e9}%.2f s (run $i)")
    }
    spark.stop()
  }
}
