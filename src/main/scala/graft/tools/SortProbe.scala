package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftConf
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftConf(SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIMING $tag: ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val full = graft.SparkEntry.queries("dedup_substr")
    noop(full(spark, sfDir)) // warmup
    (1 to 2).foreach(i => t(s"dedup_substr WITH sort $i") { noop(full(spark, sfDir)) })
    val nosort = graft.operators.PipelineOps.dedupSubstrOn(graft.Tables.load(spark, sfDir, "documents"))
    (1 to 2).foreach(i => t(s"dedup_substr NO sort $i") { noop(nosort) })
    spark.stop()
  }
}
