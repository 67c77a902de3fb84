package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{GraftConf, SparkEntry}
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftConf(SparkSession.builder().master("local[8]"), "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.write.format("noop").mode("overwrite").save()
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
